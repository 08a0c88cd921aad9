# Runnable importer image — the counterpart of the reference's
# Dockerfile (/root/reference/Dockerfile:4-21 builds gtfsclean from
# source; :73 CMDs `node importer.js`). Here the cleaning stages are
# library code, so the image is just: a Spark distribution + the thin
# application jar + the env-driven entrypoint.
#
# Build:  sbt package && docker build -t graft-importer .
# Run:    docker run -e GTFS_DOWNLOAD_USER_AGENT=me@example.org \
#                    -e GTFS_DOWNLOAD_URL=https://example.org/gtfs.zip \
#                    -e GTFS_IMPORTER_DB_PREFIX=gtfs \
#                    -v gtfs-store:/var/lib/gtfs \
#                    graft-importer
#
# apache/spark:4.1.2-scala2.13-java17-ubuntu ships Spark under
# /opt/spark — the same layout bin/graft-importer assumes locally.
FROM apache/spark:4.1.2-scala2.13-java17-ubuntu

LABEL org.opencontainers.image.title="graft-gtfs-importer"
LABEL org.opencontainers.image.description="Atomically imports GTFS into a Spark parquet warehouse (optionally bulk-loading PostGIS via JDBC), with gtfsclean-equivalent cleaning and gtfs-via-postgres-equivalent views."

WORKDIR /importer

COPY target/scala-2.13/postgisgtfsimporterspark_2.13-*.jar ./target/scala-2.13/
COPY bin/graft-importer ./bin/graft-importer

# same role as the reference's /etc/gtfs mount point: drop
# preprocess.sh / postprocessing.d here to hook the pipeline
# (both are hashed into the feed digest — editing them defeats
# skip-if-unchanged, H3)
RUN mkdir -p /etc/gtfs /var/lib/gtfs /tmp/gtfs

ENV GTFS_STORE_ROOT=/var/lib/gtfs
ENV GTFS_TMP_DIR=/tmp/gtfs
ENV SPARK_HOME=/opt/spark

ENTRYPOINT []
CMD ["./bin/graft-importer"]
