#!/bin/bash
cd /root/repo
rm -rf /tmp/gv_01 /tmp/gv_001
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gv_01" > /root/repo/.logs/v2_01.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/gv_01 > /root/repo/.logs/c2_01.log 2>&1
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/gv_001" > /root/repo/.logs/v2_001.log 2>&1
python3 tools/check.py /root/testdata/sf0.001 /tmp/gv_001 > /root/repo/.logs/c2_001.log 2>&1
echo DONE
