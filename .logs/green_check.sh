#!/bin/bash
set -x
cd /root/repo
echo "=== COMPILE+TEST ==="
sbt -batch compile test > /root/repo/.logs/sbt_test.log 2>&1
echo "sbt test rc=$?"
echo "=== VERIFY sf0.01 ==="
rm -rf /tmp/graft_verify
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify" > /root/repo/.logs/verify_001.log 2>&1
echo "verify rc=$?"
python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_verify > /root/repo/.logs/check_001.log 2>&1
echo "check rc=$?"
echo "=== VERIFY sf0.001 ==="
rm -rf /tmp/graft_verify_sf0001
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/graft_verify_sf0001" > /root/repo/.logs/verify_0001.log 2>&1
echo "verify rc=$?"
python3 tools/check.py /root/testdata/sf0.001 /tmp/graft_verify_sf0001 > /root/repo/.logs/check_0001.log 2>&1
echo "check rc=$?"
echo "=== DONE ==="
