#!/bin/bash
# Drive the REFERENCE Go client's own test suite against the graft server —
# the loop this build environment cannot close (no Go toolchain; see
# README "Reference Go client"). Run from the repo root on a machine with
# Go ≥1.17 and a checkout of the reference (up9inc/basenine) client:
#
#   BASENINE_CLIENT_DIR=/path/to/basenine/client/go ./test/client_go.sh
#
# Mirrors the reference's test/client_go.sh (start server, run client tests,
# kill server).
set -u

CLIENT_DIR="${BASENINE_CLIENT_DIR:?set BASENINE_CLIENT_DIR to basenine/client/go}"
DATA_DIR="$(mktemp -d)"

sbt -batch "runMain graft.ServerMain 9099 $DATA_DIR" &
SBT_PID=$!

# wait for the listener
for _ in $(seq 1 120); do
  if (exec 3<>/dev/tcp/127.0.0.1/9099) 2>/dev/null; then exec 3>&-; break; fi
  sleep 1
done

(cd "$CLIENT_DIR" && go test ./... -v -race -covermode=atomic -coverprofile=coverage.out)
EXIT_CODE=$?

kill "$SBT_PID" 2>/dev/null
rm -rf "$DATA_DIR"
exit $EXIT_CODE
