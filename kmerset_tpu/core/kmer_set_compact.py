"""KmerSetCompact: immutable compressed k-mer set = its SPSS strings.

Mirrors the reference KmerSetCompact (reference:
lib/core/kmer_set_compact.h:25-348).  The on-disk format is byte-compatible
with the reference: one ACGT string per line, optionally piped through an
external compressor (reference: kmer_set_compact.h:62-87 — Dump/Load are
just WriteLines/ReadLines of the SPSS).

In memory, strings live as a PackedStrings (flat 2-bit-code array +
offsets) — the same information the reference packs into a vector<bool> +
streamvbyte-compressed lengths (reference: kmer_set_compact.h:230-265);
the sorted decoded k-mer array is cached because sampling buckets and set
algebra are pure slicing/merging on it.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import io as core_io
from . import spss as spss_mod
from .config import KConfig
from .kmer_set import KmerSet
from .strings import PackedStrings


class KmerSetCompact:
    __slots__ = (
        "k", "_spss", "_spss2", "_pending", "_kmers_cache", "_cache_canonical"
    )

    def __init__(self, k: int, spss: Optional[PackedStrings]):
        self.k = k
        self._spss = spss
        self._spss2 = None  # 2-bit packed resident form (pack_in_memory)
        self._pending = None
        self._kmers_cache: Optional[np.ndarray] = None
        self._cache_canonical: Optional[bool] = None

    @property
    def spss(self) -> PackedStrings:
        """The SPSS strings; built on first consumption for lazily
        constructed sets (see from_kmer_set).  Construction is a pure
        function of the k-mer array, so deferring it changes nothing
        observable — only when the work happens.  Sets packed in memory
        (pack_in_memory) unpack fresh per access — deliberately
        uncached, so resident multi-set state stays at 2 bits/base."""
        if self._spss is None and self._spss2 is not None:
            return self._spss2.unpack()
        if self._spss is None:
            kmers, canonical, fast, dev = self._pending
            ks = KmerSet(self.k, kmers, _sorted=True)
            # Re-attach the device-resident mirror (count -> graph
            # fusion): without it the SPSS front-end re-staged the set
            # and the slow-link gate closed, silently dropping the
            # fused path for every compact build.  valid_for re-checks
            # the handle against the array at consumption time, so a
            # stale mirror on a deferred (lazy) build falls back safely.
            ks.device = dev
            if canonical:
                self._spss = spss_mod.get_spss_canonical(ks, fast)
            else:
                self._spss = spss_mod.get_spss(ks)
            self._pending = None
        return self._spss

    @spss.setter
    def spss(self, value: PackedStrings) -> None:
        self._spss = value
        self._spss2 = None
        self._pending = None
        # The cached decode belonged to the previous strings.
        self._kmers_cache = None
        self._cache_canonical = None

    def pack_in_memory(self) -> None:
        """Converts the resident STRING form to 2 bits/base (the
        reference's in-memory density for SPSS bits,
        lib/core/kmer_set_compact.h:339-347): ~4x less RSS on the
        string codes.  The decoded-kmers cache (_kmers_cache, 8 B/kmer)
        deliberately stays resident: it is the multi-set greedy loop's
        working set, and keeping it is this framework's speed-for-memory
        trade against the reference, which re-decodes ToKmerSet from the
        packed bits every factoring round (kmer_set_set.h:332-343) —
        so total resident state is bounded by the caches, not the
        strings.  Lazy (unbuilt) sets are left alone — packing would
        force the deferred SPSS build.  Consumers transparently unpack
        per phase via the spss property."""
        if self._spss is not None:
            from .strings import Packed2Strings

            self._spss2 = Packed2Strings.from_packed_strings(self._spss)
            self._spss = None

    # -- conversions (reference: kmer_set_compact.h:36-55) -----------------

    @classmethod
    def from_kmer_set(
        cls,
        kmer_set: KmerSet,
        canonical: bool,
        fast: bool = True,
        lazy: bool = False,
    ) -> "KmerSetCompact":
        """With lazy=True the SPSS build (the expensive unitig + path-cover
        phases) is deferred until something consumes the strings (weight,
        dump, spss).  The multi-set greedy loop rebuilds sets that are
        often re-factored before any string is read; deferring skips the
        superseded builds while producing byte-identical output
        (reference eagerly rebuilds each round: lib/core/kmer_set_set.h:
        332-367)."""
        obj = cls(kmer_set.k, None)
        obj._pending = (kmer_set.kmers, canonical, fast, kmer_set.device)
        if not lazy:
            obj.spss  # noqa: B018 - force the build now
        obj._kmers_cache = kmer_set.kmers
        obj._cache_canonical = canonical
        return obj

    def to_kmer_set(self, canonical: bool) -> KmerSet:
        return KmerSet(self.k, self.kmers(canonical), _sorted=True)

    def kmers(self, canonical: bool) -> np.ndarray:
        """Sorted unique decoded k-mers (cached; decode policy lives in
        spss.decode_unique_kmers)."""
        if self._kmers_cache is None or self._cache_canonical != canonical:
            self._kmers_cache = spss_mod.decode_unique_kmers(
                self.spss, self.k, canonical
            )
            self._cache_canonical = canonical
        return self._kmers_cache

    # -- persistence (reference: kmer_set_compact.h:57-87) -----------------

    def dump(self, file_name: str, compressor: str = "") -> None:
        # One vectorized blob instead of a per-string Python list
        # (byte-identical output; ~1 s -> ~0.1 s at 19M bases).
        core_io.write_file_bytes(
            file_name, compressor, self.spss.to_lines_bytes()
        )

    @classmethod
    def load(cls, k: int, file_name: str, decompressor: str = "") -> "KmerSetCompact":
        data = core_io.read_file_bytes(file_name, decompressor)
        if b"\r" in data:
            # Universal-newline parity with the old text-mode reader: a
            # CRLF (or classic-Mac) dump must keep loading.
            data = data.replace(b"\r\n", b"\n").replace(b"\r", b"\n")
        return cls(k, PackedStrings.from_lines_bytes(data))

    # -- metrics (reference: kmer_set_compact.h:89-115) --------------------

    def size(self) -> int:
        """Number of stored k-mers: sum of (len - k + 1).

        Equal to the distinct-k-mer count by the SPSS freshness invariant
        (every k-mer appears exactly once), so the cached decoded array
        answers without forcing a deferred build."""
        if self._spss is None and self._kmers_cache is not None:
            return int(self._kmers_cache.shape[0])
        if self._spss is None and self._spss2 is not None:
            return self._spss2.size_kmers(self.k)
        return self.spss.size_kmers(self.k)

    def weight(self) -> int:
        """Sum of string lengths (pre-compression byte estimate)."""
        if self._spss is None and self._spss2 is not None:
            return self._spss2.weight()  # offsets only; no unpack
        return self.spss.weight()

    # -- similarity sketch (reference: kmer_set_compact.h:117-203) ---------

    def sampled_kmers(
        self, config: KConfig, bucket_ids: np.ndarray, canonical: bool
    ) -> np.ndarray:
        """Sorted k-mers whose bucket id (high N bits) is in bucket_ids.

        The reference materializes per-bucket sorted key vectors; with a
        sorted array representation the sample is contiguous slicing."""
        return self.to_kmer_set(canonical).sample_buckets(config, bucket_ids)
