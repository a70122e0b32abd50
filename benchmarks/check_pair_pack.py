#!/usr/bin/env python
"""TPU check: pair-key Pallas pack kernel parity vs the XLA roll path,
plus k=19/23 count_to_set throughput."""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmerset_tpu.ops import backend
    from kmerset_tpu.ops.count import _pair_windows, count_to_set

    backend.enable_compile_cache()
    print(f"device: {jax.devices()[0]}")

    rng = np.random.default_rng(0)

    # Parity: kernel vs XLA rolls on the same codes.
    import os

    for k in (19, 23):
        codes = jnp.asarray(rng.integers(0, 4, size=200003, dtype=np.int32))
        hi_k, lo_k = jax.jit(lambda c, _k=k: _pair_windows(c, _k, True))(codes)
        os.environ["KMERSET_TPU_NO_PALLAS"] = "1"
        try:
            hi_x, lo_x = jax.jit(lambda c, _k=k: _pair_windows(c, _k, True))(codes)
        finally:
            del os.environ["KMERSET_TPU_NO_PALLAS"]
        n = codes.shape[0] - k + 1
        ok_hi = np.array_equal(np.asarray(hi_k[:n]), np.asarray(hi_x[:n]))
        ok_lo = np.array_equal(np.asarray(lo_k[:n]), np.asarray(lo_x[:n]))
        print(f"k={k} pair-pack parity: hi={ok_hi} lo={ok_lo}")
        assert ok_hi and ok_lo

    # Throughput: count_to_set at 4M windows for k = 15/19/23.
    for k in (15, 19, 23):
        N = 1 << 22
        codes = jnp.asarray(rng.integers(0, 4, size=N + k - 1, dtype=np.int32))
        valid = jnp.ones(N + k - 1, dtype=bool).at[-(k - 1):].set(False)

        def step(c, i, _k=k, _valid=valid):
            c2 = (c + i) & 3
            out, n_kept, _ = count_to_set(c2, _valid, _k, True, 1)
            return (n_kept + out[0] + out[out.shape[0] // 2]).astype(jnp.int32)

        @jax.jit
        def loop(x, iters):
            def body(i, carry):
                x, acc = carry
                return (x, acc + step(x, i))

            _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.int32(0)))
            return acc

        int(loop(codes, 1))
        reps = 100
        t0 = time.perf_counter()
        int(loop(codes, reps))
        dt = (time.perf_counter() - t0) / reps
        print(f"count_to_set k={k}: {dt*1e3:.3f} ms  {N/dt/1e6:.0f} Mkmers/s")


if __name__ == "__main__":
    main()
