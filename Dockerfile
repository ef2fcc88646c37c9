# Container packaging — the reference ships a docker-run-able image
# (/root/reference/Dockerfile:1-28; start.sh:4-6 runs it exposing Bolt 7687
# and HTTP 7474). Same shape here: a build stage compiles the library into
# a THIN jar (all engine dependencies are the Spark distribution's own
# jars), and the runtime stage is a stock Apache Spark image whose
# /opt/spark/jars is exactly the unmanagedBase layout build.sbt compiles
# against — so the image adds one small jar on top of a standard base.
#
# BUILD-ONLY in this sandbox (no docker daemon, zero egress); the identical
# launch path outside a container is scripts/serve.sh, and
# PackagedServeSpec drives the packaged-jar boot end to end per round.

FROM apache/spark:4.1.2-scala2.13-java17-python3-ubuntu AS spark

FROM sbtscala/scala-sbt:eclipse-temurin-jammy-17.0.10_7_1.10.0_2.13.14 AS builder
WORKDIR /app
# the build resolves Spark from the distribution jars, not an artifact repo
COPY --from=spark /opt/spark/jars /opt/spark/jars
COPY build.sbt ./
COPY project/build.properties project/
COPY src/main src/main
RUN sbt -batch package

FROM apache/spark:4.1.2-scala2.13-java17-python3-ubuntu
WORKDIR /app
COPY --from=builder /app/target/scala-2.13/neo4j_graphdbspark_2.13-*.jar /app/graft.jar
COPY scripts/spark-jvm.opts scripts/spark-jvm.opts
# dotenv defaults (GRAFT_STORE_DIR & co.); real env vars win, as dotenv does
COPY .env.example .env
EXPOSE 7687 7474
# store volume: the label-partitioned parquet GraphStore survives restarts
VOLUME ["/data"]
ENV GRAFT_STORE_DIR=/data/graft_store
CMD ["sh", "-c", "exec java @scripts/spark-jvm.opts -Xmx${SPARK_DRIVER_MEM:-8g} -cp '/app/graft.jar:/opt/spark/jars/*' graft.Serve .env"]
