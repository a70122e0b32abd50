"""Round-5 probe: where does the warm production count phase spend time?

Runs KmerCounter.from_fasta on the 16.8M-base bench genome twice (first
warm-up, then measured) with KMERSET_TPU_TIMING=1 so backend.device_count
prints its stage accounting, plus outer timings for the file read + FASTA
parse.  VERDICT r4 item 1: production measures 4.4-4.9 s warm while summed
stages read ~1.5 s — this pins the untimed remainder.
"""

import os
import sys
import time

os.environ.setdefault("KMERSET_TPU_TIMING", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 15
N_BASES = 1 << 24


def main():
    import tempfile

    from bench import _make_genome_fasta
    from kmerset_tpu.ops import backend

    backend.enable_compile_cache()
    fa = os.path.join(tempfile.gettempdir(), f"bench_genome_{N_BASES}.fasta")
    if not os.path.exists(fa):
        _make_genome_fasta(fa, N_BASES)

    from kmerset_tpu.core.kmer_counter import KmerCounter

    for trial in range(4):
        t0 = time.perf_counter()
        counter = KmerCounter.from_fasta(K, fa, "", canonical=True, spss_ahead=True)
        t1 = time.perf_counter()
        tag = "warmup" if trial == 0 else f"trial{trial}"
        print(f"[{tag}] from_fasta total {t1-t0:.3f}s n={counter.kmers.shape[0]}",
              file=sys.stderr, flush=True)
        del counter


if __name__ == "__main__":
    main()
