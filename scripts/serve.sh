#!/bin/sh
# One-command deployment — the reference's start.sh analog
# (/root/reference/start.sh:4-6 runs a container exposing Bolt 7687 and
# HTTP 7474): boots graft.Serve over a dotenv config file. Usage:
#   scripts/serve.sh [envfile]     (default ./.env; see .env.example)
#
# PACKAGED launch (round 14): sbt is the BUILD tool only — the service
# process is a plain `java` over the thin library jar plus the Spark
# distribution jars (/opt/spark/jars, the same unmanagedBase the build
# compiles against). On a real cluster the equivalent is
#   spark-submit --class graft.Serve target/scala-2.13/neo4j_graphdbspark_2.13-*.jar
# (spark-submit injects the module opens that scripts/spark-jvm.opts
# carries for the standalone-java path). The Dockerfile packages this
# exact launch into the reference's docker-run shape.
cd "$(dirname "$0")/.." || exit 1
JAR=$(ls target/scala-2.13/neo4j_graphdbspark_2.13-*.jar 2>/dev/null | head -1)
if [ -z "$JAR" ]; then
  echo "serve.sh: no packaged jar yet — building once (sbt package)" >&2
  sbt -batch package 1>&2 || exit 1
  JAR=$(ls target/scala-2.13/neo4j_graphdbspark_2.13-*.jar | head -1)
fi
exec java @scripts/spark-jvm.opts -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$JAR:/opt/spark/jars/*" graft.Serve "${1:-.env}"
