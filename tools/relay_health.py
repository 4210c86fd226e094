"""Quick relay health probe: compile, put, fetch latencies.

The axon relay's device->host fetch path swings by orders of magnitude
with unrelated load (2026-08-20: 64MB fetch at 0.4 MB/s while puts ran
at 580 MB/s).  Run this before interpreting any on-chip timing.
"""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    print(f"devices: {jax.devices()} ({time.time()-t0:.1f}s)", flush=True)

    @jax.jit
    def f(x):
        return (x * 3 + 1).sum()

    x = jnp.zeros((128, 128), jnp.int32)
    t0 = time.time()
    jax.block_until_ready(f(x))
    print(f"tiny compile+run: {time.time()-t0:.2f}s", flush=True)

    for kb in (16, 1024, 16384):
        a = np.zeros(kb * 1024 // 4, np.int32)
        t0 = time.time()
        d = jax.device_put(a)
        jax.block_until_ready(d)
        put = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(d)
            ts.append(time.time() - t0)
        print(
            f"{kb:>6}KB  put {put:.3f}s  fetch {' '.join('%.3f' % t for t in ts)}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
