"""App-level IO helpers (reference: lib/io.h:21-99)."""

from __future__ import annotations

import shutil
import tempfile

from ..core.kmer_set import KmerSet
from ..core.kmer_set_compact import KmerSetCompact


def get_kmer_set_from_file(
    k: int, file_name: str, decompressor: str, canonical: bool
) -> KmerSet:
    """Load a KmerSetCompact file and decode it to a KmerSet
    (reference: lib/io.h:21-49)."""
    return KmerSetCompact.load(k, file_name, decompressor).to_kmer_set(canonical)


class TemporaryFile:
    """RAII temp file path (reference: lib/io.h:53-75)."""

    def __init__(self):
        f = tempfile.NamedTemporaryFile(delete=False)
        f.close()
        self._name = f.name

    def name(self) -> str:
        return self._name

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        import os

        try:
            os.remove(self._name)
        except OSError:
            pass


class TemporaryDirectory:
    """RAII temp directory path (reference: lib/io.h:78-99)."""

    def __init__(self):
        self._name = tempfile.mkdtemp()

    def name(self) -> str:
        return self._name

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        shutil.rmtree(self._name, ignore_errors=True)
