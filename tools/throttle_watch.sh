#!/bin/bash
# Samples host CPU throttle every 20 min: times a 1e8-add python busy loop.
# Clean host ~2 s; throttled host reads 7-10 s. Appends JSONL to tools/throttle_watch.log.
while true; do
  T=$(python3 -c "
import time
t0=time.time()
s=0
for i in range(100000000): s+=i
print(round(time.time()-t0,2))")
  echo "{\"ts\":\"$(date -Is)\",\"probe_sec\":$T}" >> /root/repo/tools/throttle_watch.log
  sleep 1200
done
