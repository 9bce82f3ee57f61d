#!/bin/bash
cd /root/repo
/root/repo/.logs/verify2.sh > /root/repo/.logs/verify5.log 2>&1
sbt -batch test > /root/repo/.logs/sbt_test4.log 2>&1
echo "test rc=$?" >> /root/repo/.logs/verify5.log
echo ALLDONE >> /root/repo/.logs/verify5.log
