#!/usr/bin/env python
"""Round-2 measurement addendum: sort variants (stable, narrow dtypes,
payload lanes) + count_to_set decomposition on the default device."""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmerset_tpu.ops import backend

    backend.enable_compile_cache()
    print(f"device: {jax.devices()[0]}")

    def timed_loop(step_fn, operand, reps=100):
        @jax.jit
        def loop(x, iters):
            def body(i, carry):
                x, acc = carry
                return (x, acc + step_fn(x, i))

            _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.int32(0)))
            return acc

        int(loop(operand, 1))
        t0 = time.perf_counter()
        int(loop(operand, reps))
        return (time.perf_counter() - t0) / reps

    rng = np.random.default_rng(0)
    N = 1 << 22

    x32 = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.int32))
    x16 = jnp.asarray(rng.integers(0, 1 << 15, size=N).astype(np.int16))

    def s32_unstable(x, i):
        (s,) = jax.lax.sort(((x + i) & 0x3FFFFFFF,), num_keys=1, is_stable=False)
        return s[0] + s[N // 2]

    def s32_stable(x, i):
        (s,) = jax.lax.sort(((x + i) & 0x3FFFFFFF,), num_keys=1, is_stable=True)
        return s[0] + s[N // 2]

    def s16_unstable(x, i):
        (s,) = jax.lax.sort((x + i.astype(jnp.int16),), num_keys=1, is_stable=False)
        return (s[0] + s[N // 2]).astype(jnp.int32)

    def s16_stable_payload(x, i):
        s, p = jax.lax.sort(
            (x + i.astype(jnp.int16), x), num_keys=1, is_stable=True
        )
        return (s[0] + p[N // 2]).astype(jnp.int32)

    def s32_2lane(x, i):
        s, p = jax.lax.sort(((x + i) & 0x3FFFFFFF, x), num_keys=1, is_stable=False)
        return s[0] + p[N // 2]

    def f32_unstable(x, i):
        f = jax.lax.bitcast_convert_type((x + i) & 0x3FFFFFFF, jnp.float32)
        (s,) = jax.lax.sort((f,), num_keys=1, is_stable=False)
        return jax.lax.bitcast_convert_type(s[0], jnp.int32) + jax.lax.bitcast_convert_type(s[N // 2], jnp.int32)

    for name, fn, op in (
        ("int32 4M unstable", s32_unstable, x32),
        ("int32 4M stable  ", s32_stable, x32),
        ("int32 4M 2-lane  ", s32_2lane, x32),
        ("int16 4M unstable", s16_unstable, x16),
        ("int16 4M stable+p", s16_stable_payload, x16),
        ("f32   4M unstable", f32_unstable, x32),
    ):
        dt = timed_loop(fn, op)
        print(f"{name}: {dt*1e3:.3f} ms")

    # count_to_set decomposition at 4M, k=15: full vs no-compact-kernel
    from kmerset_tpu.ops.count import _sorted_runs, count_to_set

    K = 15
    codes = jnp.asarray(rng.integers(0, 4, size=N + K - 1, dtype=np.int32))
    valid = jnp.ones(N + K - 1, dtype=bool).at[-(K - 1):].set(False)

    def full(c, i):
        c2 = (c + i) & 3
        out, n_kept, _ = count_to_set(c2, valid, K, True, 1)
        return (n_kept + out[0] + out[out.shape[0] // 2]).astype(jnp.int32)

    def runs_only(c, i):
        c2 = (c + i) & 3
        to64, keys, live, boundary = _sorted_runs(c2, valid, K, True)
        return (jnp.sum(boundary) + keys[0][0]).astype(jnp.int32)

    print(f"count_to_set full     : {timed_loop(full, codes)*1e3:.3f} ms")
    print(f"sorted_runs+boundary  : {timed_loop(runs_only, codes)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
