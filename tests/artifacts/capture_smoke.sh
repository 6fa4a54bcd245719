#!/bin/sh
# CPU smoke run of every round-5 capture stage (VERDICT round-4 item 8).
# Exits nonzero if any stage fails. Run before every chip window.
exec sh "$(dirname "$0")/capture_round5.sh" smoke
