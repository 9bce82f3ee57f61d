#!/bin/bash
cd /root/repo
while ! grep -q DONE /root/repo/.logs/verify3.log 2>/dev/null; do sleep 15; done
sbt -batch test > /root/repo/.logs/sbt_test2.log 2>&1
echo "test rc=$?" >> /root/repo/.logs/verify3.log
