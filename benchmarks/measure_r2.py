#!/usr/bin/env python
"""Round-2 measurement sweep: lax.sort cost vs size + count_to_set step
time vs batch size, on the default JAX device.  All timings amortize
dispatch latency by iterating inside one compiled fori_loop.
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmerset_tpu.ops import backend
    from kmerset_tpu.ops.count import count_to_set

    backend.enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}")

    def timed_loop(step_fn, operand, reps):
        @jax.jit
        def loop(x, iters):
            def body(i, carry):
                x, acc = carry
                return (x, acc + step_fn(x, i))

            _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.int32(0)))
            return acc

        t0 = time.perf_counter()
        int(loop(operand, 1))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(loop(operand, reps))
        dt = (time.perf_counter() - t0) / reps
        return dt, compile_s

    rng = np.random.default_rng(0)

    # --- flat sort cost vs size ---
    for logn in (18, 19, 20, 21, 22, 23):
        n = 1 << logn
        x = jnp.asarray(rng.integers(0, 1 << 30, size=n, dtype=np.int32))

        def step(x, i, _n=n):
            (s,) = jax.lax.sort(((x + i) & 0x3FFFFFFF,), num_keys=1, is_stable=False)
            return s[0] + s[_n // 2]

        dt, cs = timed_loop(step, x, 100)
        print(f"flat sort  n=2^{logn} ({n>>20 or n>>10}{'M' if n>=1<<20 else 'K'}): "
              f"{dt*1e3:.3f} ms  ({dt*1e9/n:.3f} ns/elt)  [compile {cs:.0f}s]")

    # --- row sort cost (fixed 4M elements, varying rows) ---
    for rows, cols in ((256, 16384), (512, 8192), (1024, 4096), (64, 65536)):
        x = jnp.asarray(
            rng.integers(0, 1 << 30, size=rows * cols, dtype=np.int32)
        ).reshape(rows, cols)

        def step(x, i):
            s = jax.lax.sort(((x + i) & 0x3FFFFFFF,), dimension=1, num_keys=1,
                             is_stable=False)[0]
            return s[0, 0] + s[rows // 2, cols // 2]

        dt, cs = timed_loop(step, x, 100)
        print(f"row sort ({rows}, {cols}): {dt*1e3:.3f} ms  [compile {cs:.0f}s]")

    # --- full count_to_set step vs batch size (k=15) ---
    K = 15
    for logn in (19, 20, 21, 22):
        nw = 1 << logn
        codes = jnp.asarray(rng.integers(0, 4, size=nw + K - 1, dtype=np.int32))
        valid = jnp.ones(nw + K - 1, dtype=bool).at[-(K - 1):].set(False)

        def step(c, i, _valid=valid):
            c2 = (c + i) & 3
            out, n_kept, n_cut = count_to_set(c2, _valid, K, True, 1)
            return (n_kept + out[0] + out[out.shape[0] // 2]).astype(jnp.int32)

        dt, cs = timed_loop(step, codes, 100)
        rate = nw / dt
        print(f"count_to_set k=15 n=2^{logn}: {dt*1e3:.3f} ms  "
              f"{rate/1e6:.0f} Mkmers/s  [compile {cs:.0f}s]")


if __name__ == "__main__":
    main()
