"""kmerset-multiple-compress: jointly compress N compact set files into a
directory (reference: src/kmerset-multiple-compress.cc)."""

from __future__ import annotations

import argparse
import sys

from ..core.config import get_config
from ..core.kmer_set_compact import KmerSetCompact
from ..core.kmer_set_set import KmerSetSet
from ..utils import flags as flag_util
from ..utils.log import enable_debug_logs, init_default_logger


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description=(
            "Compresses multiple k-mer sets. Usage: kmerset-multiple-compress "
            "[options] <paths to file> <path to file> ..."
        )
    )
    flag_util.add_common_flags(parser, compressor=True)
    parser.add_argument(
        "--out", default="", help="directory path to save dumped files"
    )
    parser.add_argument(
        "--extension", default="txt", help="extension for output files"
    )
    parser.add_argument(
        "--out_graph", default="", help="path to save dumped DOT file"
    )
    parser.add_argument(
        "--seed", type=int, default=0,
        help="seed for similarity-sketch bucket sampling (the reference "
        "samples nondeterministically; this build is reproducible)",
    )
    parser.add_argument("files", nargs="+", help="paths to compact set files")
    args = flag_util.parse_args(parser, argv)

    logger = init_default_logger()
    if args.debug:
        enable_debug_logs()
    flag_util.check_k(args.k)
    flag_util.apply_workers(args)
    cfg = get_config(args.k)

    from ..parallel.driver import maybe_init_distributed

    maybe_init_distributed()

    # Parallel per-file load under --workers (reference:
    # src/kmerset-multiple-compress.cc:45-82); the decompressor pipes and
    # file reads overlap even on one core.
    from concurrent.futures import ThreadPoolExecutor

    def _load(item):
        i, file = item
        logger.info("reading: i = %d, file = %s", i, file)
        c = KmerSetCompact.load(cfg.k, file, args.decompressor)
        logger.info("finished reading: i = %d, file = %s", i, file)
        return c

    try:
        with ThreadPoolExecutor(max_workers=max(1, args.workers)) as ex:
            compacts = list(ex.map(_load, enumerate(args.files)))
    except Exception as e:  # noqa: BLE001
        logger.error("failed to read file: %s", e)
        sys.exit(1)

    total_size = 0
    for i, c in enumerate(compacts):
        size = c.size()
        logger.info("i = %d, size = %d", i, size)
        total_size += size
    logger.info("total_size = %d", total_size)

    logger.info("constructing kmer_set_set")
    with flag_util.trace_context(args):  # --trace captures the hot phase
        kss = KmerSetSet(
            compacts, args.canonical, cfg, seed=args.seed,
            workers=max(1, args.workers),
        )
    logger.info("constructed kmer_set_set")

    if args.out_graph:
        logger.info("dumping graph")
        try:
            kss.dump_graph(args.out_graph)
        except Exception as e:  # noqa: BLE001
            logger.error("failed to dump graph: %s", e)
        logger.info("dumped graph")

    if args.out:
        try:
            kss.dump(
                args.out, args.compressor, args.extension,
                workers=args.workers,
            )
        except Exception as e:  # noqa: BLE001
            logger.error("failed to dump kmer_set_set: %s", e)
            sys.exit(1)


if __name__ == "__main__":
    main()
