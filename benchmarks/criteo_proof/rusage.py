"""Tiny /usr/bin/time -v stand-in (not installed in this image): runs the
command, prints wall seconds and peak child RSS."""

import resource
import subprocess
import sys
import time

t0 = time.time()
rc = subprocess.call(sys.argv[1:])
ru = resource.getrusage(resource.RUSAGE_CHILDREN)
print(f"\nMaximum resident set size (kbytes): {ru.ru_maxrss}\n"
      f"Elapsed (wall clock) seconds: {time.time() - t0:.1f}", flush=True)
sys.exit(rc)
