"""KmerCounter tests (reference: test/kmer_counter.cc:12-62)."""

import numpy as np
import pytest

from kmerset_tpu.core import kmer as kc
from kmerset_tpu.core import io as core_io
from kmerset_tpu.core.kmer_counter import KmerCounter


def test_from_reads_counts():
    counter = KmerCounter.from_reads(3, ["AAAA"], canonical=False)
    # AAAA -> AAA twice.
    assert counter.get(kc.string_to_kmer("AAA")) == 2
    assert counter.size() == 1


def test_split_at_n():
    counter = KmerCounter.from_reads(3, ["AAANAAA"], canonical=False)
    assert counter.get(kc.string_to_kmer("AAA")) == 2
    counter2 = KmerCounter.from_reads(3, ["AAANCGT"], canonical=False)
    assert counter2.get(kc.string_to_kmer("AAA")) == 1
    assert counter2.get(kc.string_to_kmer("CGT")) == 1
    # No window crosses the 'N' boundary.
    assert counter2.size() == 2


def test_canonical_counting():
    # ACG's revcomp is CGT; canonical is min.
    counter = KmerCounter.from_reads(3, ["ACG", "CGT"], canonical=True)
    assert counter.size() == 1
    can = int(kc.canonical(np.int64(kc.string_to_kmer("ACG")), 3))
    assert counter.get(can) == 2


def test_cutoff():
    counter = KmerCounter.from_reads(3, ["AAAA", "CCC"], canonical=False)
    s, n_cut = counter.to_kmer_set(2)
    assert s.size() == 1 and n_cut == 1
    assert s.contains_one(kc.string_to_kmer("AAA"))


def test_saturating_add():
    counter = KmerCounter(3)
    x = kc.string_to_kmer("ACG")
    counter.add(x, 250)
    counter.add(x, 250)
    assert counter.get(x) == 255


def test_fasta_validation():
    with pytest.raises(core_io.IOError_):
        KmerCounter.from_fasta_lines(3, [">a", "ACGT", ">b"], canonical=False)
    with pytest.raises(core_io.IOError_):
        KmerCounter.from_fasta_lines(3, [">a", "ACGX"], canonical=False)
    with pytest.raises(core_io.IOError_):
        KmerCounter.from_fasta_lines(3, ["ACGT", "ACGT"], canonical=False)
    c = KmerCounter.from_fasta_lines(3, [">a", "ACGT", ">b", "GGGG"], canonical=False)
    assert c.size() == 3


def test_fasta_file_round_trip(tmp_path):
    path = tmp_path / "x.fasta"
    path.write_text(">a\nACGTACGT\n>b\nTTTTT\n")
    c = KmerCounter.from_fasta(5, str(path), "", canonical=False)
    assert c.get(kc.string_to_kmer("ACGTA")) == 1
    assert c.get(kc.string_to_kmer("TTTTT")) == 1


def test_gzip_round_trip(tmp_path):
    # Subprocess (de)compressor path (reference: test/io.cc:40-56).
    path = tmp_path / "x.txt.gz"
    core_io.write_lines(str(path), "gzip", ["hello", "world"])
    assert core_io.read_lines(str(path), "gzip -d") == ["hello", "world"]
