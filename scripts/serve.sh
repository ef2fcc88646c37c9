#!/bin/sh
# One-command deployment — the reference's start.sh analog
# (/root/reference/start.sh:4-6 runs a container exposing Bolt 7687 and
# HTTP 7474): boots graft.Serve over a dotenv config file. Usage:
#   scripts/serve.sh [envfile]     (default ./.env; see .env.example)
cd "$(dirname "$0")/.." && exec sbt "runMain graft.Serve ${1:-.env}"
