"""Native kmerio loader tests — parity against the pure-Python paths."""

import numpy as np
import pytest

from kmerset_tpu.core import io as core_io
from kmerset_tpu.core import native
from kmerset_tpu.core.kmer_counter import KmerCounter

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="libkmerio.so not built"
)


def test_parse_fasta_matches_python():
    text = ">a\nACGTNNACG\n>b\nTTT\n>c\nNNN\n"
    codes, offsets = native.parse_fasta_bytes(text.encode())
    reads = core_io.parse_fasta_lines(text.strip().split("\n"))
    pcodes, poffsets = core_io.reads_to_codes(reads)
    np.testing.assert_array_equal(codes, pcodes)
    np.testing.assert_array_equal(offsets, poffsets)


def test_parse_fasta_errors():
    with pytest.raises(ValueError):
        native.parse_fasta_bytes(b">a\nACGT\n>b\n")  # odd lines
    with pytest.raises(ValueError):
        native.parse_fasta_bytes(b"ACGT\nACGT\n")  # no header
    with pytest.raises(ValueError):
        native.parse_fasta_bytes(b">a\nACGX\n")  # bad char


def test_counter_native_path(tmp_path):
    path = tmp_path / "x.fasta"
    path.write_text(">a\nACGTACGT\n>b\nTTTTT\n")
    c = KmerCounter.from_fasta(5, str(path), "", canonical=False)
    c2 = KmerCounter.from_fasta_lines(
        5, [">a", "ACGTACGT", ">b", "TTTTT"], canonical=False
    )
    np.testing.assert_array_equal(c.kmers, c2.kmers)
    np.testing.assert_array_equal(c.counts, c2.counts)


def test_pack_unpack_round_trip():
    rng = np.random.default_rng(0)
    for n in [0, 1, 3, 4, 5, 1000]:
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        packed = native.pack2(codes)
        assert packed.shape[0] == (n + 3) // 4
        np.testing.assert_array_equal(native.unpack2(packed, n), codes)
