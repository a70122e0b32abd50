"""Backend selection: host NumPy vs device (TPU) for the counting path.

Policy: the device pipeline pays jax import + compile + transfer overhead,
so it only wins for large inputs.  The threshold is overridable via
KMERSET_TPU_MIN_DEVICE_WINDOWS; KMERSET_TPU_FORCE_BACKEND=host|device
forces a side (tests force host implicitly by running tiny inputs).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..utils.log import get_logger

_log = get_logger()

# Count of device-path attempts that fell back to host with an exception
# (visible via debug logs; tests assert on it so a dead TPU path cannot
# silently masquerade as a host-speed "regression").
FALLBACK_COUNT = 0


def _note_fallback(where: str, e: Exception) -> None:
    global FALLBACK_COUNT
    FALLBACK_COUNT += 1
    _log.debug("device path %s failed, falling back to host: %r", where, e)

DEFAULT_MIN_DEVICE_WINDOWS = 1 << 21
# Graph-side offload (fused side tables -> successor, ops/unitigs.py)
# moves ~15 bytes/k-mer over the host<->device link (int32 up, (2,n)
# int32 succ + three bool masks down).  On a fast (PCIe-class) link it
# wins from ~8M k-mers.  Through a ~60 MB/s tunneled link a warm process
# runs 21.5s vs 34s host at 29M, but a fresh CLI process pays device
# init + cold transfers and measured 65s — so the slow-link gate stays
# effectively closed (x64) and only deliberate long-lived processes
# (KMERSET_TPU_FORCE_BACKEND=device) use it there.
DEFAULT_MIN_DEVICE_GRAPH = 1 << 23
_GRAPH_SLOW_FACTOR = 64


def _env_int(name: str, default: int) -> int:
    """Env-var integer with a logged fallback (a malformed override must
    degrade to the default, not crash every gated call — same contract
    as the KMERSET_TPU_DEVICE_TIMEOUT parser)."""
    v = os.environ.get(name, "")
    if not v:
        return default
    try:
        return int(v)
    except ValueError:
        _log.warning("ignoring malformed %s=%r (using %d)", name, v, default)
        return default


def _threshold() -> int:
    return _env_int("KMERSET_TPU_MIN_DEVICE_WINDOWS", DEFAULT_MIN_DEVICE_WINDOWS)


class _StageTimer:
    """Per-call stage timestamps, printed to stderr when
    KMERSET_TPU_TIMING is set (the dispatch-gap probe; zero cost when
    off).  Each tick records the wall time since the previous tick, so
    the printout is a contiguous accounting of the call."""

    __slots__ = ("t0", "prev", "items", "name")

    def __init__(self, name: str):
        import time as _time

        self.name = name
        self.t0 = self.prev = _time.perf_counter()
        self.items = []

    def tick(self, label: str) -> None:
        import time as _time

        now = _time.perf_counter()
        self.items.append((label, now - self.prev))
        self.prev = now

    def done(self) -> None:
        import sys as _sys
        import time as _time

        total = _time.perf_counter() - self.t0
        parts = " ".join(f"{l}={dt:.3f}" for l, dt in self.items)
        print(f"[timing] {self.name}: {parts} total={total:.3f}", file=_sys.stderr)


class _NullTimer:
    __slots__ = ()

    def tick(self, label: str) -> None:
        pass

    def done(self) -> None:
        pass


_NULL_TIMER = _NullTimer()


def _stage_timer(name: str):
    if os.environ.get("KMERSET_TPU_TIMING"):
        return _StageTimer(name)
    return _NULL_TIMER


def _graph_threshold() -> int:
    return _env_int("KMERSET_TPU_MIN_DEVICE_GRAPH", DEFAULT_MIN_DEVICE_GRAPH)


def _force() -> str:
    return os.environ.get("KMERSET_TPU_FORCE_BACKEND", "")


def _have_native() -> bool:
    """True when the C helper library is loadable (the slow-link side-code
    wire format depends on its succ rebuild, native kmerio_succ_from_sides)."""
    try:
        from ..core import native

        return native.get_lib() is not None
    except Exception:  # noqa: BLE001 - availability probe only
        return False


_SLOW_LINK_FACTOR = 64
_link_slow: Optional[bool] = None


def _link_cache_path() -> str:
    return os.path.join(
        os.path.expanduser("~"), ".cache", "kmerset_tpu_link"
    )


def _slow_link() -> bool:
    """True when host<->device transfers run far below PCIe speed (e.g. a
    tunneled/remote device).  Offload pipelines that round-trip data per
    byte of input only pay off on a fast link, so slow links scale every
    size threshold up by _SLOW_LINK_FACTOR.  Probed once per MACHINE (one
    ~8 MB round trip; the verdict is cached on disk so host-only CLIs like
    kmerset-multiple-decompress don't pay the backend dial every process);
    override with KMERSET_TPU_LINK=fast|slow."""
    global _link_slow
    if _link_slow is None:
        env = os.environ.get("KMERSET_TPU_LINK", "")
        if env in ("fast", "slow"):
            _link_slow = env == "slow"
            return _link_slow
        # The verdict is specific to the selected jax platform (a CPU
        # "device" is in-process); key the cache on the env selection so
        # switching JAX_PLATFORMS re-probes.
        cache_key = os.environ.get("JAX_PLATFORMS", "default")
        try:
            st = os.stat(_link_cache_path())
            import time as _time

            # 24h TTL: the verdict goes stale when the machine's device
            # topology changes (e.g. tunneled device -> local PCIe), which
            # no env-var key can see without initializing jax.
            if _time.time() - st.st_mtime < 24 * 3600:
                with open(_link_cache_path()) as f:
                    key, _, verdict = f.read().strip().partition(":")
                    if key == cache_key:
                        _link_slow = verdict == "slow"
                        return _link_slow
        except OSError:
            pass
        if not _backend_alive():
            # Dead/hung device transport: the probe itself would block.
            _link_slow = True
            return _link_slow
        try:
            import time

            import jax
            import jax.numpy as jnp

            x = np.zeros(1 << 21, dtype=np.int32)  # 8 MB
            f = jax.jit(lambda a: a + 1)
            np.asarray(f(x))  # compile + warm
            t0 = time.perf_counter()
            np.asarray(f(x))
            dt = time.perf_counter() - t0
            bw = 2 * x.nbytes / max(dt, 1e-9)
            _link_slow = bw < (1 << 30)  # < 1 GB/s round trip
        except Exception:  # noqa: BLE001
            # Transient probe failure (device busy, flaky jit): treat as
            # slow for THIS process only — persisting it would poison
            # every process on the machine for 24h.
            _link_slow = True
            return _link_slow
        try:
            import jax as _jax

            # Never PERSIST a verdict measured against an in-process CPU
            # backend: the env-var cache key cannot distinguish it from
            # a real-device process (JAX_PLATFORMS unset in both), so a
            # CPU probe's tens-of-GB/s "fast" would open every slow-link
            # gate of a later tunneled-TPU process on this machine for
            # 24h.  The in-process verdict above still applies.
            if _jax.default_backend() == "cpu":
                return _link_slow
        except Exception:  # noqa: BLE001 - can't tell: don't persist
            return _link_slow
        try:
            os.makedirs(os.path.dirname(_link_cache_path()), exist_ok=True)
            with open(_link_cache_path(), "w") as f:
                f.write(f"{cache_key}:{'slow' if _link_slow else 'fast'}")
        except OSError:
            pass
    return _link_slow


_backend_ready: Optional[bool] = None


def _backend_alive() -> bool:
    """Initializes jax's default backend once, under a timeout.  A dead
    or hung device transport (e.g. an unreachable tunneled TPU) blocks
    jax.default_backend() indefinitely — and with it every CLI that so
    much as asks whether a device exists.  The init runs in a daemon
    thread; on timeout the process permanently treats the device as
    absent (all host paths, counted in FALLBACK_COUNT like any other
    device fallback).  KMERSET_TPU_DEVICE_TIMEOUT overrides the 180 s
    default; 0 disables the guard (block forever, jax's own behavior)."""
    global _backend_ready
    if _backend_ready is None:
        try:
            import jax
        except Exception:  # noqa: BLE001 - no jax => no device either
            _backend_ready = False
            return False
        try:
            timeout = float(
                os.environ.get("KMERSET_TPU_DEVICE_TIMEOUT", "180")
            )
        except ValueError:
            timeout = 180.0
        if timeout <= 0:
            try:
                jax.default_backend()
                _backend_ready = True
            except Exception as e:  # noqa: BLE001
                _note_fallback("backend_init", e)
                _backend_ready = False
            return _backend_ready
        import threading

        result: dict = {}

        def _init() -> None:
            try:
                result["backend"] = jax.default_backend()
            except Exception as e:  # noqa: BLE001
                result["error"] = e

        t = threading.Thread(
            target=_init, daemon=True, name="kmerset-tpu-backend-init"
        )
        t.start()
        t.join(timeout)
        if t.is_alive():
            _note_fallback(
                "backend_init",
                TimeoutError(
                    f"device backend init exceeded {timeout:.0f}s "
                    "(set KMERSET_TPU_DEVICE_TIMEOUT to adjust)"
                ),
            )
            _backend_ready = False
        elif "error" in result:
            _note_fallback("backend_init", result["error"])
            _backend_ready = False
        else:
            _backend_ready = True
    return _backend_ready


def _cpu_backend() -> bool:
    """True when jax's default backend is the host CPU itself (or no
    usable device backend exists — see _backend_alive).  The offload
    pipelines exist to use an accelerator; routed to XLA-CPU they
    lose to the native/NumPy host paths (measured: an 8-set compress ran
    >20x slower under JAX_PLATFORMS=cpu on a single-core host, paying an
    XLA-CPU recompile per distinct greedy-loop size class).  Tests that
    exercise the device code paths on CPU set
    KMERSET_TPU_FORCE_BACKEND=device, which bypasses this check."""
    if not _backend_alive():
        return True
    try:
        import jax

        return jax.default_backend() == "cpu"
    except Exception:  # noqa: BLE001 - no jax => no device either
        return True


# Single-chip capacity ceiling for the one-shot counting sort: the sort
# carries ~3-4x its int32 operands in HBM (16 GB on v5e).  Above this the
# attempt would OOM and fall back to host anyway; skip the wasted upload.
# Larger-than-chip sets are the mesh backend's job (parallel/mesh.py).
MAX_DEVICE_WINDOWS = 1 << 29


# Per-shot window count of the out-of-core chunked path (half the one-shot
# ceiling: two live chunk buffers fit where one maximal sort did).
CHUNK_WINDOWS = 1 << 28


def should_use_device_chunked(n_windows: int) -> bool:
    """Out-of-core single-chip counting: inputs past the one-shot sort
    ceiling are counted in CHUNK_WINDOWS slices and merged on the host.
    Only worth it off the mesh path (a second device would take it), on a
    non-slow link (the codes stream crosses the link once per chunk)."""
    force = _force()
    if force == "host":
        return False
    if n_windows <= MAX_DEVICE_WINDOWS:
        return False  # the one-shot path owns this range
    if force == "device":
        return True
    if _cpu_backend():
        return False
    return not _slow_link()


def should_use_device(
    n_windows: int, spss_ahead: bool = False,
    k: int | None = None, canonical: bool = True,
) -> bool:
    """`spss_ahead` marks a count whose result feeds an SPSS build in the
    same process (kmerset-build, KmerSetCompact round trips): the count
    then leaves a device-resident handle (ops/resident.py) that lets the
    graph phase skip its upload AND replaces the host side-table cost —
    so on a slow link the gate opens at the graph threshold (~8M) instead
    of the counting slow-link factor (~128M), amortizing the link over
    both phases.

    When `k` is given, the slow-link spss_ahead arm additionally
    requires the key download to have a compact wire format for the
    worst-case key count (every window unique): for sparse keyspaces
    (k = 19/23) the delta plan rejects and the download would be the
    raw 8 B/key — measured 6.5 s for 16.7M keys at k=23 against a
    1.8-4 s host count, a 2-4x regression the old gate silently took.
    Small inputs pass regardless (raw is cheap there)."""
    force = _force()
    if force == "host":
        return False
    if force == "device":
        # Even forced, respect the one-shot sort's HBM ceiling (the sort
        # carries 3-4x its operands) — mirrors should_use_device_graph's
        # forced cap; oversize inputs go to the chunked/mesh paths.
        return n_windows <= MAX_DEVICE_WINDOWS
    if n_windows < _threshold() or n_windows > MAX_DEVICE_WINDOWS:
        return False
    if _cpu_backend():
        return False
    if not _slow_link() or n_windows >= _threshold() * _SLOW_LINK_FACTOR:
        return True
    if not (spss_ahead and n_windows >= _graph_threshold()):
        return False
    if k is not None and n_windows * 8 > (32 << 20):
        from .deltas import plan_escape

        if plan_escape(n_windows, k, canonical) is None:
            # Raw-download wire would eat the offload win.  This is the
            # worst-case (every window unique) model: a high-coverage
            # input whose real key count is far below n_windows loses
            # the offload here — conservative by design, and logged so
            # the refusal is not silent.
            _log.debug(
                "slow-link count gate closed for k=%d at %d windows: "
                "no compact key wire format at worst-case density",
                k, n_windows,
            )
            return False
    return True


# Upper cap for the graph-side joins: lookup_join32/lookup_join_pair
# (ops/join.py) pack slots and found-flags into int32 bits [0, 30), and
# the side-table path issues m = 8 * padded_n queries — so padded_n must
# stay well under 2^27.  Mirrors MAX_DEVICE_WINDOWS for the count path.
MAX_DEVICE_GRAPH_KMERS = 1 << 26


def should_use_device_graph(n_kmers: int, resident: bool = False) -> bool:
    """`resident=True` means the sorted set is already ON the device
    (a DeviceKmers handle from the count phase, ops/resident.py): the
    upload leg — the reason the slow-link factor existed — is gone, so
    the gate opens at the base threshold even through a tunneled link.
    The succ/terminal download (~11 B/k-mer) remains, but so does the
    host side-table cost it displaces (measured round 3: 21.5 s device
    vs 34 s host at 29M k-mers WITH the upload still paid)."""
    force = _force()
    if force == "host":
        return False
    if force == "device":
        return n_kmers <= MAX_DEVICE_GRAPH_KMERS
    if n_kmers < _graph_threshold() or n_kmers > MAX_DEVICE_GRAPH_KMERS:
        return False
    if _cpu_backend():
        return False
    if resident:
        return True
    return not _slow_link() or n_kmers >= _graph_threshold() * _GRAPH_SLOW_FACTOR


def _host_cpu_fingerprint() -> str:
    """Short digest of this host's CPU feature flags.  XLA's cache hash
    does not cover the *loading* host's ISA: a CPU AOT artifact compiled
    on a VM exposing e.g. AMX/prefer-no-scatter loads on a lesser host
    with an 'could lead to SIGILL' error (seen in practice — hypervisors
    here migrate the feature set day to day).  Keying the cache directory
    by the flag set makes stale cross-machine artifacts invisible."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{flags}"
    return hashlib.sha1(raw.encode()).hexdigest()[:10]


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache so repeated CLI invocations skip
    recompiles (jit programs here are large; cold compiles can take
    minutes through a remote device)."""
    try:
        import jax

        cache_dir = os.environ.get(
            "KMERSET_TPU_COMPILE_CACHE",
            os.path.join(
                os.path.expanduser("~"),
                ".cache",
                f"kmerset_tpu_jax_{_host_cpu_fingerprint()}",
            ),
        )
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


def _staged_windows_u8(codes: np.ndarray, offsets: np.ndarray, k: int):
    """Slim staging for the frag-validity count entries: 2-bit packed
    codes (0.25 B/base up the link) + the pow2-padded int32 boundary
    array + the unpadded length + the static unpacked code count
    (count_kmers_frag unpacks and computes the window-validity mask on
    device).  Returns (packed, bounds_i32, total, L) or None for inputs
    under one window."""
    from .count import good_sort_size

    total = codes.shape[0]
    if total < k:
        return None
    n_keys = total - (k - 1)
    target = good_sort_size(n_keys)
    codes = codes.astype(np.uint8, copy=False)
    if target != n_keys:
        codes = np.concatenate(
            [codes, np.zeros(target - n_keys, np.uint8)]
        )
    bounds = np.asarray(offsets, dtype=np.int64)[1:]
    # Floor the pad class at 4096: the boundary count is a second jit
    # compilation dimension, and one class covering every input up to
    # 4096 fragments (16 KB of upload) avoids a fresh multi-second
    # compile of the fused count pipeline per fragment-count pow2 class.
    bp = 1 << max(12, int(bounds.shape[0] - 1).bit_length())
    if bp > bounds.shape[0]:
        bounds = np.concatenate(
            [bounds, np.full(bp - bounds.shape[0], total, np.int64)]
        )
    from ..core import native

    return (
        native.pack2(np.ascontiguousarray(codes)),
        bounds.astype(np.int32),
        total,
        codes.shape[0],
    )


def device_unique(
    codes: np.ndarray, offsets: np.ndarray, k: int, canonical: bool
) -> Optional[np.ndarray]:
    """Sorted distinct (canonical) k-mers of the fragment stream on the
    accelerator — the decode direction (GetKmerSetFromSPSS, reference:
    lib/core/spss.h:1862-1941) runs the counting pipeline at cutoff 1 and
    skips count materialization entirely."""
    try:
        from .count import count_to_set_frag  # noqa: F401 - import probe
    except Exception:  # noqa: BLE001
        return None
    try:
        # Same dispatch/trim pair the chunked path drives — one
        # implementation of the staging and slicing, not two.
        t = _unique_dispatch(codes, offsets, k, canonical)
        if t is None:
            return None
        return _unique_fetch(t)
    except Exception as e:  # noqa: BLE001
        _note_fallback("device_unique", e)
        return None


def _merge_count_pair(ak, ac, bk, bc):
    """One merge of two sorted-unique (keys, counts) runs, summing counts
    of shared keys (native one-pass merge; numpy stable-sort fallback)."""
    from ..core import native

    m = native.merge_counts(ak, ac, bk, bc)
    if m is None:
        keys = np.concatenate([ak, bk])
        cnts = np.concatenate([ac, bc])
        if keys.size == 0:
            return keys, cnts
        order = np.argsort(keys, kind="stable")
        keys, cnts = keys[order], cnts[order]
        boundary = np.empty(keys.shape[0], dtype=bool)
        boundary[0] = True
        np.not_equal(keys[1:], keys[:-1], out=boundary[1:])
        idx = np.flatnonzero(boundary)
        m = keys[idx], np.add.reduceat(cnts, idx)
    return m


def _merge_key_pair(ak, bk):
    """Keys-only sorted-union merge (kmerio_merge_counts' NULL-count
    mode; np.union1d fallback)."""
    from ..core import native

    m = native.merge_keys(ak, bk)
    if m is None:
        m = np.union1d(ak, bk)
    return m


def _merge_cascade(parts: list, merge_pair):
    """Balanced pairwise merge of sorted runs down to one."""
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts) - 1, 2):
            a, b = parts[i], parts[i + 1]
            if isinstance(a, tuple):
                nxt.append(merge_pair(a[0], a[1], b[0], b[1]))
            else:
                nxt.append(merge_pair(a, b))
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _merge_count_runs(parts: list) -> Tuple[np.ndarray, np.ndarray]:
    return _merge_cascade(parts, _merge_count_pair)


def _chunk_slices(codes: np.ndarray, offsets: np.ndarray, k: int):
    """Yields (codes_slice, offsets_slice) per CHUNK_WINDOWS-window chunk,
    each with a k-1 code halo (the mesh shard-layout boundary treatment,
    parallel/driver._shard_layout): windows starting in [lo, hi) see
    their true fragment cover, so per-chunk validity equals the global
    one.  Fragment boundaries are located with searchsorted on the
    already-sorted offsets instead of clipping the whole array."""
    n_windows = codes.shape[0] - (k - 1)
    lo = 0
    while lo < n_windows:
        hi = min(lo + CHUNK_WINDOWS, n_windows)
        hi_code = hi + k - 1
        a = np.searchsorted(offsets, lo, side="right")
        b = np.searchsorted(offsets, hi_code, side="left")
        offs_c = np.unique(
            np.concatenate([[0], offsets[a:b] - lo, [hi_code - lo]])
        )
        yield codes[lo:hi_code], offs_c
        lo = hi


def _count_dispatch(codes, offsets, k, canonical):
    """Stages one chunk and launches the fused count program WITHOUT
    blocking (jax dispatch is async): returns opaque device handles for
    _count_fetch, or None for empty inputs."""
    from .count import count_kmers_frag

    staged = _staged_windows_u8(codes, offsets, k)
    if staged is None:
        return None
    packed, bounds, total, L = staged
    return count_kmers_frag(packed, bounds, total, L, k, canonical)


def _count_fetch(t) -> Tuple[np.ndarray, np.ndarray]:
    uniq, counts, n_unique = t
    n = int(n_unique)
    return np.asarray(uniq[:n]), np.asarray(counts[:n], dtype=np.int64)


def _unique_dispatch(codes, offsets, k, canonical):
    from .count import count_to_set_frag

    staged = _staged_windows_u8(codes, offsets, k)
    if staged is None:
        return None
    packed, bounds, total, L = staged
    uniq, n_kept, _ = count_to_set_frag(packed, bounds, total, L, k, canonical, 1)
    return uniq, n_kept


def _unique_fetch(t) -> np.ndarray:
    uniq, n_kept = t
    return np.asarray(uniq[: int(n_kept)])


def _device_chunked(codes, offsets, k, canonical, dispatch, fetch,
                    merge_pair, tag):
    """Shared driver of the out-of-core chunked paths: runs the fused
    one-shot program per halo chunk and combines the sorted per-chunk
    results with a balanced cascade of merge_pair calls.  Replaces the
    reference's shared-memory bucket merge
    (lib/core/kmer_counter.h:105-126) at out-of-core scale.

    Double-buffered: chunk i+1 is staged and DISPATCHED (async) before
    chunk i's results are downloaded, so the chip sorts one chunk while
    the link carries the previous one's outputs — CHUNK_WINDOWS is half
    the one-shot ceiling precisely so two chunks' sort working sets fit
    in HBM together."""
    try:
        if codes.shape[0] - (k - 1) <= 0:
            return None
        parts = []
        pending = None
        for codes_c, offs_c in _chunk_slices(codes, offsets, k):
            cur = dispatch(codes_c, offs_c, k, canonical)
            if cur is None:
                return None
            if pending is not None:
                parts.append(fetch(pending))
            pending = cur
        if pending is not None:
            parts.append(fetch(pending))
        if not parts:
            return None
        return _merge_cascade(parts, merge_pair)
    except Exception as e:  # noqa: BLE001
        _note_fallback(tag, e)
        return None


def device_count_chunked(
    codes: np.ndarray, offsets: np.ndarray, k: int, canonical: bool
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Out-of-core single-chip counting: CHUNK_WINDOWS-window halo chunks
    through the fused one-shot pipeline, merged on the host — so a lone
    chip keeps its full counting throughput on inputs its HBM cannot
    hold in one sort."""
    return _device_chunked(
        codes, offsets, k, canonical,
        _count_dispatch, _count_fetch,
        _merge_count_pair, "device_count_chunked",
    )


def device_unique_chunked(
    codes: np.ndarray, offsets: np.ndarray, k: int, canonical: bool
) -> Optional[np.ndarray]:
    """Out-of-core decode direction: halo chunks through the cutoff-1
    unique pipeline, combined by keys-only sorted-union merges."""
    return _device_chunked(
        codes, offsets, k, canonical,
        _unique_dispatch, _unique_fetch,
        _merge_key_pair, "device_unique_chunked",
    )


DELTA_MIN_KEYS = 1 << 20


def device_count(
    codes: np.ndarray, offsets: np.ndarray, k: int, canonical: bool,
    resident: bool = False, value_max: int = 0, spss_ahead: bool = False,
    lazy_counts: bool = False,
) -> Optional[Tuple]:
    """Counts k-mers on the accelerator; returns (uniq, counts) — plus a
    DeviceKmers handle (or None) as a third element when `resident` is
    asked — or None if the device path is unavailable (caller falls back
    to host).  The handle keeps the sorted unique array ON the device so
    the graph phase skips its re-upload (ops/resident.py).

    `value_max > 0` saturates counts ON the device before the download
    (the host stores min(count, value_max) anyway — reference AddWithMax,
    lib/core/kmer_counter.h:28-38); with the uint8 default that shrinks
    the counts transfer 8x and the k <= 15 int32 uniq conversion halves
    the key transfer.  Chunked/merge callers pass value_max=0: partial
    counts must stay raw or cross-chunk sums would saturate early."""
    try:
        from .count import count_kmers_frag
    except Exception:  # noqa: BLE001 - any jax failure => host fallback
        return None
    tm = _stage_timer("device_count")
    try:
        staged = _staged_windows_u8(codes, offsets, k)
        if staged is None:
            return None
        packed, bounds, total, L = staged
        tm.tick("stage")
        uniq, counts, n_unique = count_kmers_frag(
            packed, bounds, total, L, k, canonical
        )
        tm.tick("dispatch")
        n = int(n_unique)
        tm.tick("sync_n")
        # Gap-encoded key download (1-2 B/k-mer instead of 4-8,
        # ops/deltas.py): the encode is DISPATCHED before any other
        # device work so the wire arrays exist early and their DMA can
        # overlap the side-code prefetch's compute — queued after it,
        # the fetch would wait out that whole jit first (measured
        # +1.7 s at 16.5M keys).
        delta_pending = None
        # Size first: small counts must not trigger the 8 MB link probe
        # (and its disk-cache write) for a branch already known dead.
        if n >= DELTA_MIN_KEYS and _slow_link():
            from .deltas import dispatch_delta, fetch_delta

            delta_pending = dispatch_delta(uniq, n, k, canonical)
            tm.tick("delta_dispatch")
        handle = None
        if resident:
            # Dispatch the resident shrink BEFORE the blocking downloads
            # so the device-to-device copy overlaps the link transfer.
            from .resident import DeviceKmers

            handle = DeviceKmers.from_count_outputs(
                uniq, counts, n, k, canonical
            )
            tm.tick("shrink_dispatch")
            if (
                handle is not None
                and spss_ahead
                # Mirror should_use_device_graph's bounds: below the
                # graph threshold the SPSS phase will route host-side
                # and the prefetched side-code jit (a multi-second cold
                # compile), its compute, and its download would all be
                # discarded.
                and _graph_threshold() <= n <= MAX_DEVICE_GRAPH_KMERS
                and _slow_link()
                and _have_native()
            ):
                # A build follows on a slow link: the graph phase will
                # consume side codes (the 1-byte wire format needs the
                # native succ rebuild) — dispatch their jit now so its
                # device compute overlaps the key download below.
                handle.prefetch_sides()
                tm.tick("sides_dispatch")
        uniq_h = None
        if delta_pending is not None:
            uniq_h = fetch_delta(delta_pending, n)
            tm.tick("delta_fetch")
        if uniq_h is None:
            uniq_n = uniq[:n]
            if value_max and k <= 15:
                # 2k <= 30-bit keys: convert on-device, download 4 B/key.
                uniq_n = uniq_n.astype(np.int32)
            uniq_h = np.asarray(uniq_n).astype(np.int64, copy=False)
            tm.tick("raw_fetch")
        def _trim_counts():
            counts_n = counts[:n]
            if value_max:
                import jax.numpy as jnp

                counts_n = jnp.minimum(counts_n, value_max)
                if value_max <= 255:
                    counts_n = counts_n.astype(np.uint8)
            return counts_n

        if lazy_counts:
            # The build flow (cutoff <= 1) never reads counts: defer the
            # transfer behind a closure the counter materializes on first
            # host access (KmerCounter.counts).  The trim itself is
            # dispatched NOW (async) so only the saturated uint8 array
            # (1 B/key) stays pinned in HBM through the graph phase, not
            # the padded int32 count buffer.
            trimmed = _trim_counts()

            def counts_h():
                return np.asarray(trimmed).astype(np.int64, copy=False)
        else:
            counts_h = np.asarray(_trim_counts()).astype(np.int64, copy=False)
        tm.tick("counts")
        if not resident:
            tm.done()
            return uniq_h, counts_h
        if handle is not None:
            handle = handle.with_endpoints(uniq_h)
            if handle is not None:
                # The blocking downloads above are done — let the
                # prefetched side codes cross the now-idle link while
                # the host works toward the SPSS phase.
                handle.start_sides_download()
        tm.tick("endpoints")
        tm.done()
        return uniq_h, counts_h, handle
    except Exception as e:  # noqa: BLE001
        _note_fallback("device_count", e)
        return None
