"""Quick axon-tunnel health probe: exits 0 iff a trivial device matmul
completes within --timeout (default 90 s).

The tunnel can WEDGE (round-4 sessions: every device call blocks forever
— client epoll-waits on the RPC — while `jax.devices()` still answers;
self-recovers ~40-60 min later; see docs/PLATFORM.md round-4 drift row).
Run this before starting a long bench, and after killing a zero-CPU
zero-output client.  The probe varies its input each call so the
tunnel's result cache cannot fake a pass.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/tunnel_health.py [--timeout=90]
"""

import os
import subprocess
import sys
import time


def main():
    timeout = 90
    for a in sys.argv[1:]:
        if a.startswith("--timeout="):
            timeout = int(a.split("=", 1)[1])
    # the device call must run in a CHILD: a wedged call blocks the main
    # thread in C and cannot be interrupted by SIGALRM from within
    code = (
        "import time, jax, jax.numpy as jnp\n"
        f"x = jnp.full((128, 128), float({time.time_ns() % 97} + 2))\n"
        "t0 = time.time()\n"
        "s = float((x @ x).sum())\n"
        "print(f'TUNNEL OK sum={s:.0f} in {time.time()-t0:.1f}s',"
        " flush=True)\n")
    try:
        res = subprocess.run([sys.executable, "-u", "-c", code],
                             timeout=timeout, capture_output=True,
                             text=True, env=dict(os.environ))
    except subprocess.TimeoutExpired:
        print(f"TUNNEL WEDGED: no result within {timeout}s", flush=True)
        return 1
    out = (res.stdout or "") + (res.stderr or "")
    ok = res.returncode == 0 and "TUNNEL OK" in out
    print(out.strip().splitlines()[-1] if out.strip() else f"exit "
          f"{res.returncode}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
