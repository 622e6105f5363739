"""Generation CLI — load a checkpoint (or random-init) and sample.

The reference has no inference entry point at all (SURVEY.md §1: no
generation loop, no CLI beyond train.py); this provides one:

  # text-only, random init, greedy
  python scripts/generate.py --model language --layers 2 --dim 64 \
      --ffn-dim 128 --heads 4 --prompt "hello world" --max-new-tokens 16

  # from a Trainer checkpoint directory
  python scripts/generate.py --model language --checkpoint checkpoints/ \
      --prompt "..." --temperature 0.8 --top-p 0.95
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--model", choices=["language", "kosmos"], default="language")
    p.add_argument("--vocab-size", type=int, default=32002)
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--ffn-dim", type=int, default=8192)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--max-positions", type=int, default=2048)
    p.add_argument("--kv-window", type=int, default=0,
                   help="rolling KV cache (StreamingLLM sinks + ring): "
                        "unbounded generation length at O(window) memory")
    p.add_argument("--kv-sink", type=int, default=4)
    p.add_argument("--no-multiway", action="store_true")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--checkpoint", default=None,
                   help="Trainer output dir; loads the latest step")
    p.add_argument("--prompt", default="The")
    p.add_argument("--image", default=None,
                   help="path to a .npy (3,H,W) image for --model kosmos")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--beam-size", type=int, default=0,
                   help="beam-search decoding with this many beams "
                        "(text or kosmos; overrides sampling flags)")
    p.add_argument("--length-penalty", type=float, default=1.0)
    p.add_argument("--eos-id", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--w8", action="store_true",
                   help="weight-only int8 inference (~half the HBM reads "
                        "per decode step)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from kosmosx_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kosmosx_tpu.core.config import (KosmosConfig, MagnetoConfig,
                                         ResamplerConfig, VisionConfig)
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.data.tokenizer import KosmosTokenizer
    from kosmosx_tpu.generate import (SamplingConfig, generate_multimodal,
                                      generate_text)

    dcfg = MagnetoConfig(
        vocab_size=args.vocab_size, embed_dim=args.dim, layers=args.layers,
        ffn_dim=args.ffn_dim, heads=args.heads,
        max_positions=args.max_positions, multiway=not args.no_multiway,
        compute_dtype=args.dtype, dropout=0.0, attention_dropout=0.0,
        kv_window=args.kv_window, kv_sink=args.kv_sink)
    scfg = SamplingConfig(max_new_tokens=args.max_new_tokens,
                          temperature=args.temperature, top_k=args.top_k,
                          top_p=args.top_p, greedy=args.greedy)
    tok = KosmosTokenizer()
    rng = jax.random.PRNGKey(args.seed)

    if args.model == "language":
        from kosmosx_tpu.models.language import KosmosLanguage

        params = init_casted(lambda k: KosmosLanguage.init(k, dcfg),
                             rng, dcfg.dtype)
        if args.checkpoint:
            params = _load(args.checkpoint, params)
        if args.w8:
            from kosmosx_tpu.utils.quantize import quantize_params_w8
            params = jax.jit(quantize_params_w8)(params)
        ids, _ = tok.tokenize_texts(args.prompt, modalities=())
        if args.beam_size > 0:
            from kosmosx_tpu.generate import beam_search

            toks, norm, _ = beam_search(
                params, dcfg, jnp.asarray(ids), beam_size=args.beam_size,
                max_new_tokens=args.max_new_tokens,
                length_penalty=args.length_penalty, eos_id=args.eos_id)
            print(f"# best beam score {float(norm[0, 0]):.4f}",
                  file=sys.stderr)
            out = toks[:, 0]
        else:
            out = generate_text(params, dcfg, jnp.asarray(ids), scfg)
    else:
        from kosmosx_tpu.models.kosmos import Kosmos

        kcfg = KosmosConfig(decoder=dcfg,
                            vision=VisionConfig(compute_dtype=args.dtype),
                            resampler=ResamplerConfig(compute_dtype=args.dtype))
        params = init_casted(lambda k: Kosmos.init(k, kcfg), rng, dcfg.dtype)
        if args.checkpoint:
            params = _load(args.checkpoint, params)
        if args.w8:
            from kosmosx_tpu.utils.quantize import quantize_params_w8
            params = jax.jit(quantize_params_w8)(params)
        ids, _ = tok.tokenize_texts(args.prompt)
        if args.image:
            img = np.load(args.image)[None]
        else:
            img = np.random.RandomState(0).rand(1, 3, 224, 224).astype(np.float32)
        imgs = tok.tokenize_images(jnp.asarray(img))
        if args.beam_size > 0:
            from kosmosx_tpu.generate import beam_search_multimodal

            toks, norm, _ = beam_search_multimodal(
                params, kcfg, jnp.asarray(ids), imgs,
                beam_size=args.beam_size,
                max_new_tokens=args.max_new_tokens,
                length_penalty=args.length_penalty, eos_id=args.eos_id)
            print(f"# best beam score {float(norm[0, 0]):.4f}",
                  file=sys.stderr)
            out = toks[:, 0]
        else:
            out = generate_multimodal(params, kcfg, jnp.asarray(ids), imgs,
                                      scfg)

    ids_out = np.asarray(out)[0].tolist()
    print("generated ids:", ids_out)
    print("decoded:", tok.decode(ids_out))


def _load(ckpt_dir, params_like):
    import jax
    import jax.numpy as jnp

    from kosmosx_tpu.train import checkpoint as ckpt

    found = ckpt.latest_checkpoint(ckpt_dir)
    if not found:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")
    try:
        state = ckpt.restore_checkpoint(found[0], {"params": params_like})
        params = state["params"]
    except Exception:
        # Trainer checkpoints also hold opt_state/step/rng; fall back to a
        # raw restore and take just the params subtree
        import orbax.checkpoint as ocp

        raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(found[0]))
        params = jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r, t.dtype), params_like, raw["params"])
    print(f"loaded {found[0]} (step {found[1]})")
    return params


if __name__ == "__main__":
    main()
