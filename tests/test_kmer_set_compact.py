"""KmerSetCompact round-trip tests (reference: test/kmer_set_compact.cc)."""

import numpy as np
import pytest

from kmerset_tpu.core.config import get_config
from kmerset_tpu.core.kmer_set_compact import KmerSetCompact
from kmerset_tpu.utils.random import get_random_kmer_set

K = 9


@pytest.mark.parametrize("canonical", [True, False])
def test_round_trip_memory(canonical):
    rng = np.random.default_rng(0 if canonical else 1)
    s = get_random_kmer_set(K, 2000, canonical, rng)
    compact = KmerSetCompact.from_kmer_set(s, canonical)
    back = compact.to_kmer_set(canonical)
    assert back.equals(s)
    assert compact.size() == s.size()


@pytest.mark.parametrize("compressor,decompressor", [("", ""), ("gzip", "gzip -d")])
def test_dump_load(tmp_path, compressor, decompressor):
    rng = np.random.default_rng(2)
    s = get_random_kmer_set(K, 1500, True, rng)
    compact = KmerSetCompact.from_kmer_set(s, True)
    path = str(tmp_path / "x.txt")
    compact.dump(path, compressor)
    loaded = KmerSetCompact.load(K, path, decompressor)
    assert loaded.to_kmer_set(True).equals(s)
    assert loaded.weight() == compact.weight()


@pytest.mark.parametrize("canonical", [True, False])
def test_pack_in_memory_byte_identical(tmp_path, canonical):
    """2-bit packed resident form (pack_in_memory): dumps, metrics, and
    decoded sets are byte/bit-identical to the unpacked form, and the
    packed bytes really are ~4x smaller than the code array."""
    rng = np.random.default_rng(11 if canonical else 12)
    s = get_random_kmer_set(K, 3000, canonical, rng)
    compact = KmerSetCompact.from_kmer_set(s, canonical)
    w, sz = compact.weight(), compact.size()
    strings_before = compact.spss.to_strings()
    n_code_bytes = compact.spss.codes.nbytes

    compact.pack_in_memory()
    assert compact._spss is None and compact._spss2 is not None
    assert compact._spss2.codes2.nbytes <= n_code_bytes // 4 + 1
    assert compact.weight() == w and compact.size() == sz
    assert compact.spss.to_strings() == strings_before
    assert compact.to_kmer_set(canonical).equals(s)

    p1 = str(tmp_path / "packed.txt")
    compact.dump(p1)
    compact2 = KmerSetCompact.from_kmer_set(s, canonical)
    p2 = str(tmp_path / "plain.txt")
    compact2.dump(p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_lines_bytes_blob_matches_string_path(tmp_path):
    """to_lines_bytes/from_lines_bytes (the vectorized dump/load blob)
    must be byte-identical to the join/split string path, including the
    empty-dump convention."""
    from kmerset_tpu.core.strings import PackedStrings

    rng = np.random.default_rng(17)
    s = get_random_kmer_set(K, 1200, True, rng)
    compact = KmerSetCompact.from_kmer_set(s, True)
    ps = compact.spss
    blob = ps.to_lines_bytes()
    want = "".join(line + "\n" for line in ps.to_strings()).encode()
    assert blob == want
    back = PackedStrings.from_lines_bytes(blob)
    assert back.to_strings() == ps.to_strings()
    # Empty conventions (read_lines maps "" and "\n" to no strings).
    assert len(PackedStrings.from_lines_bytes(b"")) == 0
    assert len(PackedStrings.from_lines_bytes(b"\n")) == 0
    with pytest.raises(ValueError):
        PackedStrings.from_lines_bytes(b"ACGX\n")


def test_load_tolerates_crlf_dumps(tmp_path):
    """A dump rewritten with CRLF line endings (hand-copied/Windows)
    must load like the old text-mode reader did (universal newlines)."""
    rng = np.random.default_rng(19)
    s = get_random_kmer_set(K, 600, True, rng)
    compact = KmerSetCompact.from_kmer_set(s, True)
    path = str(tmp_path / "unix.txt")
    compact.dump(path)
    crlf = str(tmp_path / "crlf.txt")
    with open(path, "rb") as f:
        blob = f.read()
    with open(crlf, "wb") as f:
        f.write(blob.replace(b"\n", b"\r\n"))
    loaded = KmerSetCompact.load(K, crlf)
    assert loaded.to_kmer_set(True).equals(s)


def test_packed2strings_metrics_match_unpacked():
    """Packed2Strings answers len/lengths/weight/size_kmers from its
    offsets alone — values must match the unpacked form (these back the
    KmerSetCompact fast paths that avoid unpacking for metrics)."""
    from kmerset_tpu.core.strings import Packed2Strings

    rng = np.random.default_rng(14)
    s = get_random_kmer_set(K, 800, True, rng)
    ps = KmerSetCompact.from_kmer_set(s, True).spss
    p2 = Packed2Strings.from_packed_strings(ps)
    assert len(p2) == len(ps)
    np.testing.assert_array_equal(p2.lengths(), ps.lengths())
    assert p2.weight() == ps.weight()
    assert p2.size_kmers(K) == ps.size_kmers(K)


def test_pack_in_memory_leaves_lazy_sets():
    rng = np.random.default_rng(13)
    s = get_random_kmer_set(K, 500, True, rng)
    compact = KmerSetCompact.from_kmer_set(s, True, lazy=True)
    compact.pack_in_memory()  # must NOT force the deferred build
    assert compact._pending is not None and compact._spss2 is None
    assert compact.to_kmer_set(True).equals(s)


def test_dump_format_is_plain_strings(tmp_path):
    # Byte-compat with the reference: one ACGT string per line.
    rng = np.random.default_rng(3)
    s = get_random_kmer_set(K, 200, True, rng)
    compact = KmerSetCompact.from_kmer_set(s, True)
    path = str(tmp_path / "x.txt")
    compact.dump(path, "")
    lines = open(path).read().splitlines()
    assert lines == compact.spss.to_strings()
    assert all(set(line) <= set("ACGT") for line in lines)
    assert all(len(line) >= K for line in lines)


def test_sampling(tmp_path):
    rng = np.random.default_rng(4)
    cfg = get_config(K, 10)
    s = get_random_kmer_set(K, 3000, True, rng)
    compact = KmerSetCompact.from_kmer_set(s, True)
    bucket_ids = np.array([1, 5, 700])
    sample = compact.sampled_kmers(cfg, bucket_ids, True)
    expected = s.sample_buckets(cfg, bucket_ids)
    np.testing.assert_array_equal(sample, expected)


def test_empty_set(tmp_path):
    from kmerset_tpu.core.kmer_set import KmerSet

    compact = KmerSetCompact.from_kmer_set(KmerSet(K), True)
    assert compact.size() == 0 and compact.weight() == 0
    path = str(tmp_path / "empty.txt")
    compact.dump(path, "")
    loaded = KmerSetCompact.load(K, path, "")
    assert loaded.size() == 0


def test_from_kmer_set_lazy_defers_and_matches_eager():
    """lazy=True must defer the SPSS build (no strings materialized until
    consumed) and produce byte-identical strings to the eager path;
    size() answers from the cached k-mer array without forcing it."""
    rng = np.random.default_rng(3)
    ks = get_random_kmer_set(K, 3000, True, rng)
    eager = KmerSetCompact.from_kmer_set(ks, True)
    lazy = KmerSetCompact.from_kmer_set(ks, True, lazy=True)
    assert lazy._spss is None  # still pending
    assert lazy.size() == eager.size()  # answered from the k-mer cache
    assert lazy._spss is None
    assert lazy.to_kmer_set(True).equals(eager.to_kmer_set(True))
    assert lazy._spss is None
    # first consumption builds; result identical to the eager build
    assert lazy.spss.to_strings() == eager.spss.to_strings()
    assert lazy._pending is None
    assert lazy.weight() == eager.weight()


def test_spss_setter_invalidates_kmer_cache():
    """Assigning .spss must drop the cached decode — the cache belonged to
    the previous strings (reference has no setter; ours exists so callers
    can splice in externally built SPSS)."""
    rng = np.random.default_rng(4)
    a = get_random_kmer_set(K, 800, True, rng)
    b = get_random_kmer_set(K, 800, True, rng)
    ca = KmerSetCompact.from_kmer_set(a, True)
    cb = KmerSetCompact.from_kmer_set(b, True)
    assert ca.kmers(True) is not None  # populate the cache
    ca.spss = cb.spss
    assert ca.to_kmer_set(True).equals(b)
    assert ca.size() == b.size()
