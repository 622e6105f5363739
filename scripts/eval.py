"""Perplexity-evaluation CLI.

The reference sketches eval metrics but never ships a working eval entry
point (perplexity code is commented out,
/root/reference/tests/test_benchmarking.py:225-248). This CLI evaluates a
(checkpointed or random-init) KosmosLanguage decoder on packed text files:

  python scripts/eval.py --layers 2 --dim 64 --ffn-dim 128 --heads 4 \
      --data corpus.txt --seq-len 512 --batch-size 4

  python scripts/eval.py --checkpoint checkpoints/ --data val.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--vocab-size", type=int, default=32002)
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--ffn-dim", type=int, default=8192)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--max-positions", type=int, default=2048)
    p.add_argument("--no-multiway", action="store_true")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--checkpoint", default=None,
                   help="Trainer output dir; loads the latest step")
    p.add_argument("--data", required=True, nargs="+",
                   help="text files, one document per line")
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from kosmosx_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()

    import jax

    from kosmosx_tpu.core.config import MagnetoConfig
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.data.tokenizer import KosmosTokenizer
    from kosmosx_tpu.eval import evaluate_perplexity
    from kosmosx_tpu.models.language import KosmosLanguage
    from kosmosx_tpu.train.data import packed_text_batches, text_file_stream

    dcfg = MagnetoConfig(
        vocab_size=args.vocab_size, embed_dim=args.dim, layers=args.layers,
        ffn_dim=args.ffn_dim, heads=args.heads,
        max_positions=args.max_positions, multiway=not args.no_multiway,
        compute_dtype=args.dtype, dropout=0.0, attention_dropout=0.0)
    params = init_casted(lambda k: KosmosLanguage.init(k, dcfg),
                         jax.random.PRNGKey(args.seed), dcfg.dtype)
    if args.checkpoint:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from generate import _load
        params = _load(args.checkpoint, params)

    tok = KosmosTokenizer()
    batches = packed_text_batches(
        text_file_stream(args.data, tok),
        batch_size=args.batch_size, seq_len=args.seq_len,
        eos_id=tok.eos_token_id)
    out = evaluate_perplexity(params, batches, dcfg,
                              max_batches=args.max_batches)
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
