"""Golden-format fixtures: hand-written files in the reference's on-disk
formats, verified against an INDEPENDENT in-test implementation of the
k-mer packing and XOR hash — not this codebase's own writer — so format
drift in either direction fails loudly.

Formats pinned:
- SPSS text file: one ACGT string per line
  (reference: lib/core/kmer_set_compact.h:62-87);
- multi-set directory: meta.<ext> = serialized adjacency list
  ("size key count children ...") + set count, plus <i>.<ext> SPSS files
  (reference: lib/core/kmer_set_set.h:45-85,459-530).
"""

import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
K = 9

_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def _pack(s: str) -> int:
    """Independent 2-bit packing, first base most significant
    (reference: lib/core/kmer.h:58-76)."""
    v = 0
    for ch in s:
        v = (v << 2) | _CODE[ch]
    return v


def _kmers_of_file(path, k=K):
    out = set()
    with open(path) as f:
        for line in f:
            s = line.strip()
            for i in range(len(s) - k + 1):
                out.add(_pack(s[i : i + k]))
    return out


def _xor_hash(kmers) -> int:
    h = 0
    for v in kmers:
        h ^= v
    return h


def test_spss_text_golden_load_and_redump(tmp_path):
    from kmerset_tpu.core.kmer_set_compact import KmerSetCompact

    path = os.path.join(GOLDEN, "tiny.spss.txt")
    expected = _kmers_of_file(path)

    compact = KmerSetCompact.load(K, path, "")
    ks = compact.to_kmer_set(False)
    assert ks.size() == len(expected)
    assert ks.hash() == _xor_hash(expected)
    np.testing.assert_array_equal(ks.kmers, np.array(sorted(expected)))

    # Byte-level re-dump equality: load -> dump reproduces the fixture.
    out = str(tmp_path / "redump.txt")
    compact.dump(out, "")
    with open(path, "rb") as f1, open(out, "rb") as f2:
        assert f1.read() == f2.read()


def test_multiset_directory_golden(tmp_path):
    from kmerset_tpu.core.kmer_set_set import KmerSetSet, KmerSetSetReader

    from kmerset_tpu.core.config import KConfig

    cfg = KConfig(k=K, n=4)

    d = os.path.join(GOLDEN, "multiset")
    # Hand-derived expectations: set 0 reconstructs as 0.txt ∪ 2.txt
    # (meta: key 0 has child 2), set 1 as 1.txt alone.
    exp0 = _kmers_of_file(os.path.join(d, "0.txt")) | _kmers_of_file(
        os.path.join(d, "2.txt")
    )
    exp1 = _kmers_of_file(os.path.join(d, "1.txt"))

    sss = KmerSetSet.load(cfg, d, "", "txt", False)
    got0 = sss.get(0, False)
    got1 = sss.get(1, False)
    assert got0.size() == len(exp0) and got0.hash() == _xor_hash(exp0)
    assert got1.size() == len(exp1) and got1.hash() == _xor_hash(exp1)

    # Reader (lazy) path agrees.
    reader = KmerSetSetReader.from_directory(cfg, d, "txt", "", False)
    assert reader.size() == 3
    r0 = reader.get(0)
    assert r0.size() == len(exp0) and r0.hash() == _xor_hash(exp0)

    # Byte-level re-dump: every file reproduced exactly.
    out_dir = str(tmp_path / "redump")
    sss.dump(out_dir, "", "txt")
    for name in ("meta.txt", "0.txt", "1.txt", "2.txt"):
        with open(os.path.join(d, name), "rb") as f1, open(
            os.path.join(out_dir, name), "rb"
        ) as f2:
            assert f1.read() == f2.read(), f"{name} drifted from golden"
