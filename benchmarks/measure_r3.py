#!/usr/bin/env python
"""Round-3 breakdown of the count_to_set step at 4M windows, k=15.

Times each pipeline stage separately on the default device (TPU) with
fori_loop amortization, to find what is still removable above the sort
floor.  Usage: python benchmarks/measure_r3.py
"""

from __future__ import annotations

import time

import numpy as np

K = 15
NW = 1 << 22


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmerset_tpu.ops import backend
    from kmerset_tpu.ops import count as C
    from kmerset_tpu.ops.pallas_compact import (
        _partition_rows,
        compact_select_multi,
    )

    backend.enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}")

    def timed_loop(step_fn, operands, reps=200):
        @jax.jit
        def loop(xs, iters):
            def body(i, carry):
                xs, acc = carry
                return (xs, acc + step_fn(xs, i))

            _, acc = jax.lax.fori_loop(0, iters, body, (xs, jnp.int32(0)))
            return acc

        t0 = time.perf_counter()
        int(loop(operands, 1))
        cs = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            int(loop(operands, reps))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best, cs

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=NW + K - 1, dtype=np.int32))
    valid = jnp.ones(NW + K - 1, dtype=bool).at[-(K - 1):].set(False)

    # 1. full step
    def full(xs, i):
        c = (xs + i) & 3
        out, n_kept, n_cut = C.count_to_set(c, valid, K, True, 1)
        return n_kept + out[0].astype(jnp.int32) + out[out.shape[0] // 2].astype(jnp.int32)

    def run(name, fn, operands=codes, reps=200):
        dt, cs = timed_loop(fn, operands, reps)
        print(f"{name:34s} {dt*1e3:7.3f} ms   [compile {cs:.0f}s]")
        return dt

    t_full = run("full count_to_set (cutoff=1)", full)

    # 2. windows only (pallas pack + canonical)
    def wins(xs, i):
        c = (xs + i) & 3
        w = C._single_windows(c, K, True)
        return w[0] + w[NW // 2]

    t_pack = run("canonical windows (pack)", wins)

    # 3. pack + sentinel mask + sort
    def packsort(xs, i):
        c = (xs + i) & 3
        codes2, v2 = C._slice_windows(c, valid, K)
        key = C._single_windows(codes2, K, True)[: v2.shape[0]]
        key = jnp.where(v2, key, C._S_SENT)
        (s,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        return s[0] + s[NW // 2]

    t_sort = run("pack + mask + sort", packsort)

    # 4. sorted_runs (adds boundary detection)
    def runs(xs, i):
        c = (xs + i) & 3
        to64, keys, live, boundary = C._sorted_runs(c, valid, K, True)
        return keys[0][0] + jnp.sum(boundary, dtype=jnp.int32)

    t_runs = run("sorted_runs (+boundary+sum)", runs)

    # 5. partition row-sort alone on a pre-sorted array with run-head keeps
    pre = np.sort(rng.integers(0, 1 << 30, size=C.good_sort_size(NW), dtype=np.int32))
    prej = jnp.asarray(pre)

    def part(xs, i):
        keep = jnp.concatenate(
            [jnp.ones(1, bool), xs[1:] != xs[:-1]]
        )
        rows4, c4, dst = _partition_rows([xs + (i - i)], keep, 1)
        return c4[0] + dst[-1]

    t_part = run("partition row-sort (+counts)", part, prej)

    # 6. full compactor (partition + kernel)
    def comp(xs, i):
        keep = jnp.concatenate([jnp.ones(1, bool), xs[1:] != xs[:-1]])
        lanes, n_sel = compact_select_multi([xs + (i - i)], keep, num_keys=1)
        return n_sel + lanes[0][0]

    t_comp = run("compactor (partition + kernel)", comp, prej)

    print(f"\nstep - sorted_runs = {1e3*(t_full - t_runs):.3f} ms (compaction in situ)")
    print(f"sorted_runs - packsort = {1e3*(t_runs - t_sort):.3f} ms (boundary)")
    print(f"packsort - pack = {1e3*(t_sort - t_pack):.3f} ms (sort+mask)")


if __name__ == "__main__":
    main()
