"""Serving CLI — load a model and serve prompts through the
continuous-batching engine.

The reference has no inference entry point at all (SURVEY.md §1: no
serving, no generation loop, no CLI beyond train.py); this provides the
serving counterpart to scripts/generate.py:

  # random-init smoke run, 3 prompts through 2 slots
  python scripts/serve.py --layers 2 --dim 64 --ffn-dim 128 --heads 2 \
      --max-positions 128 --dtype float32 --no-flash \
      --prompt "a b c" --prompt "d e" --prompt "f" --max-new-tokens 8

  # flagship from a Trainer checkpoint, all serving levers on
  python scripts/serve.py --checkpoint checkpoints/ \
      --sync-lag 4 --decode-block 4 --w8 --kv8 \
      --prompts-file prompts.txt

  # multimodal: pair each prompt with an image (.npy (3,H,W)); prompts
  # without a matching --image stay text-only
  python scripts/serve.py --model kosmos --prompt "describe this" \
      --image img.npy

  # HTTP daemon (serve/server.py): POST /v1/completions, /healthz, /v1/stats
  python scripts/serve.py --http 8000 --sync-lag 4 --decode-block 4

Prompts come from repeated --prompt flags, --prompts-file (one per line),
or stdin (one per line) when neither is given; with --http the server
runs until interrupted and prompts arrive over the network. Outputs print as
``[req <id>] <decoded text>`` in submission order, followed by an
aggregate tokens/sec line. See docs/performance-guide.md for what each
lever does and when to use it.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--model", choices=["language", "kosmos"],
                   default="language")
    p.add_argument("--image", action="append", default=None,
                   help="repeatable .npy (3,H,W); pairs with the i-th "
                        "prompt (--model kosmos)")
    p.add_argument("--vocab-size", type=int, default=32002)
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--ffn-dim", type=int, default=8192)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--max-positions", type=int, default=8194)
    p.add_argument("--no-multiway", action="store_true")
    p.add_argument("--no-flash", action="store_true")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--checkpoint", default=None,
                   help="Trainer output dir; loads the latest step")
    # workload
    p.add_argument("--prompt", action="append", default=None,
                   help="repeatable; falls back to --prompts-file or stdin")
    p.add_argument("--prompts-file", default=None)
    p.add_argument("--system-prefix", default=None,
                   help="shared system-prompt text: prepended to every "
                        "prompt and its KV cache registered once "
                        "(ServeEngine.register_prefix) so admissions "
                        "prefill only the per-request remainder")
    p.add_argument("--share-prefix", action="store_true",
                   help="with --system-prefix: shared-prefix ATTENTION "
                        "(one broadcast KV segment, no per-slot copies)")
    p.add_argument("--adapter", action="append", default=None,
                   metavar="NAME=PATH",
                   help="repeatable: load a LoRA adapter (the 'adapter' "
                        "dir a --lora-rank training run writes) for "
                        "multi-LoRA serving; HTTP requests select one via "
                        "the 'adapter' payload field, CLI prompts via "
                        "--use-adapter")
    p.add_argument("--use-adapter", default=None,
                   help="serve every CLI prompt through this adapter")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--eos-id", type=int, default=None)
    p.add_argument("--greedy", action="store_true", default=True)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="> 0 switches to temperature sampling")
    # engine levers (docs/performance-guide.md)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-prompt-len", type=int, default=128)
    p.add_argument("--sync-lag", type=int, default=4)
    p.add_argument("--decode-block", type=int, default=0)
    p.add_argument("--prefill-chunk", type=int, default=0)
    p.add_argument("--w8", action="store_true",
                   help="weight-only int8 (decode is weight-read-bound)")
    p.add_argument("--kv8", action="store_true",
                   help="int8 KV cache (long-context/large-batch lever)")
    p.add_argument("--kv-window", type=int, default=0,
                   help="rolling KV window (StreamingLLM sinks + ring): "
                        "slot caches hold kv-window positions however long "
                        "generations run; plain engine only")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve over HTTP instead of batch prompts "
                        "(POST /v1/completions, GET /healthz, /v1/stats)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the deploy-style warmup before taking HTTP "
                        "traffic (first request of each flavor then pays "
                        "its compile — 30 s+ per program on a remote chip)")
    return p


def _load_adapters(eng, specs):
    """--adapter NAME=PATH entries -> ServeEngine.load_adapter."""
    for spec in specs or ():
        name, _, path = spec.partition("=")
        if not name or not path:
            raise SystemExit(f"--adapter needs NAME=PATH, got {spec!r}")
        from kosmosx_tpu.train.checkpoint import restore_params

        eng.load_adapter(name, restore_params(path))


def main(argv=None):
    args = build_parser().parse_args(argv)

    from kosmosx_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()

    import jax
    import numpy as np

    from kosmosx_tpu.core.config import MagnetoConfig
    from kosmosx_tpu.core.dtypes import init_casted
    from kosmosx_tpu.data.tokenizer import KosmosTokenizer
    from kosmosx_tpu.generate import SamplingConfig
    from kosmosx_tpu.serve import ServeConfig, ServeEngine

    cfg = MagnetoConfig(
        vocab_size=args.vocab_size, embed_dim=args.dim, layers=args.layers,
        ffn_dim=args.ffn_dim, heads=args.heads,
        max_positions=args.max_positions, multiway=not args.no_multiway,
        use_flash_attention=not args.no_flash, compute_dtype=args.dtype,
        scan_layers=True, dropout=0.0, attention_dropout=0.0,
        kv_cache_dtype="int8" if args.kv8 else None,
        kv_window=args.kv_window)

    kcfg = None
    if args.model == "kosmos":
        from kosmosx_tpu.core.config import (KosmosConfig, ResamplerConfig,
                                             VisionConfig)
        from kosmosx_tpu.models.kosmos import Kosmos

        kcfg = KosmosConfig(decoder=cfg,
                            vision=VisionConfig(compute_dtype=args.dtype),
                            resampler=ResamplerConfig(
                                compute_dtype=args.dtype))
        params = init_casted(lambda k: Kosmos.init(k, kcfg),
                             jax.random.PRNGKey(args.seed), cfg.dtype)
    else:
        from kosmosx_tpu.models.language import KosmosLanguage

        params = init_casted(lambda k: KosmosLanguage.init(k, cfg),
                             jax.random.PRNGKey(args.seed), cfg.dtype)
    if args.checkpoint:
        from scripts.generate import _load
        params = _load(args.checkpoint, params)
    if args.w8:
        from kosmosx_tpu.utils.quantize import quantize_params_w8
        params = jax.jit(quantize_params_w8)(params)

    tok = KosmosTokenizer()

    prefix_ids = None
    if args.system_prefix:
        pids, _ = tok.tokenize_texts(args.system_prefix, modalities=())
        prefix_ids = [int(t) for t in np.asarray(pids).reshape(-1)]

    def _with_prefix(ids):
        """Prepend the system prefix (dropping the prompt's duplicate
        BOS); over-length combinations fail loudly instead of silently
        cutting the user's text."""
        if prefix_ids is None:
            return ids
        ids = list(ids)
        if ids and ids[0] == prefix_ids[0]:
            ids = ids[1:]
        out = prefix_ids + ids
        if len(out) > args.max_prompt_len:
            raise SystemExit(
                f"system prefix ({len(prefix_ids)}) + prompt ({len(ids)}) "
                f"exceeds --max-prompt-len {args.max_prompt_len}")
        return out

    if args.http is not None:
        scfg = ServeConfig(
            max_batch=args.slots, max_prompt_len=args.max_prompt_len,
            sync_lag=args.sync_lag, decode_block=args.decode_block,
            prefill_chunk=args.prefill_chunk,
            max_len=max(
                args.kv_window,
                args.max_prompt_len + args.max_new_tokens
                + (kcfg.image_embed_len if kcfg is not None else 0)
                + ServeConfig(sync_lag=args.sync_lag,
                              decode_block=args.decode_block
                              ).overrun_window))
        sampling = (SamplingConfig(greedy=True) if args.temperature <= 0
                    else SamplingConfig(greedy=False,
                                        temperature=args.temperature))
        eng = ServeEngine(params, cfg, scfg, sampling, kosmos_cfg=kcfg)
        if prefix_ids:
            eng.register_prefix(prefix_ids, share=args.share_prefix)
        _load_adapters(eng, args.adapter)

        class _Tok:  # adapt KosmosTokenizer to the server's encode/decode
            def encode(self, s):
                ids, _ = tok.tokenize_texts(s, modalities=())
                import numpy as _np
                ids = [int(t) for t in _np.asarray(ids).reshape(-1)]
                return _with_prefix(ids)[:args.max_prompt_len]

            def decode(self, ids):
                return tok.decode(ids)

        from kosmosx_tpu.serve import ServeServer
        wimg = None
        if kcfg is not None and not args.no_warmup:
            wimg = np.zeros((1, 3, kcfg.vision.image_size,
                             kcfg.vision.image_size), np.float32)
        srv = ServeServer(eng, host=args.host, port=args.http,
                          tokenizer=_Tok(),
                          default_max_tokens=args.max_new_tokens,
                          warmup=not args.no_warmup, warmup_images=wimg)
        srv.start()
        print(f"serving on http://{srv.address[0]}:{srv.address[1]} "
              f"(ctrl-c to stop)", file=sys.stderr)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return

    if args.prompt:
        texts = args.prompt
    elif args.prompts_file:
        with open(args.prompts_file) as f:
            texts = [ln.rstrip("\n") for ln in f if ln.strip()]
    else:
        texts = [ln.rstrip("\n") for ln in sys.stdin if ln.strip()]
    if not texts:
        raise SystemExit("no prompts (use --prompt / --prompts-file / stdin)")

    prompts = []
    for t in texts:
        ids, _ = tok.tokenize_texts(t, modalities=())
        ids = _with_prefix([int(x) for x in np.asarray(ids).reshape(-1)])
        prompts.append(np.asarray(ids, np.int32)[:args.max_prompt_len])

    scfg = ServeConfig(
        max_batch=args.slots, max_prompt_len=args.max_prompt_len,
        sync_lag=args.sync_lag, decode_block=args.decode_block,
        prefill_chunk=args.prefill_chunk,
        max_len=max(
            args.kv_window,
            args.max_prompt_len + args.max_new_tokens
            + (kcfg.image_embed_len if kcfg is not None else 0)
            + ServeConfig(sync_lag=args.sync_lag,
                          decode_block=args.decode_block
                          ).overrun_window))
    sampling = (SamplingConfig(greedy=True) if args.temperature <= 0
                else SamplingConfig(greedy=False,
                                    temperature=args.temperature))
    eng = ServeEngine(params, cfg, scfg, sampling, kosmos_cfg=kcfg)
    if prefix_ids:
        eng.register_prefix(prefix_ids, share=args.share_prefix)
    _load_adapters(eng, args.adapter)

    images = []
    for i in range(len(prompts)):
        if kcfg is not None and args.image and i < len(args.image):
            images.append(np.load(args.image[i]).astype(np.float32)[None])
        else:
            images.append(None)

    t0 = time.perf_counter()
    handles = []
    pending = list(zip(prompts, images))
    while pending and eng.num_active < args.slots:
        p, im = pending.pop(0)
        handles.append(eng.submit(p, max_new_tokens=args.max_new_tokens,
                                  eos_id=args.eos_id, images=im,
                                  adapter=args.use_adapter))
    while True:
        alive = eng.step()
        while pending and eng.num_active < args.slots:
            p, im = pending.pop(0)
            handles.append(eng.submit(p,
                                      max_new_tokens=args.max_new_tokens,
                                      eos_id=args.eos_id, images=im,
                                      adapter=args.use_adapter))
            alive = True
        if not alive and not pending:
            break
    dt = time.perf_counter() - t0
    total = sum(len(h.tokens) for h in handles)
    for h in handles:
        print(f"[req {h.id}] {tok.decode(h.tokens)}")
    print(f"# {total} tokens / {len(handles)} requests in {dt:.2f}s "
          f"= {total / dt:.0f} tok/s (incl. compile)", file=sys.stderr)


if __name__ == "__main__":
    main()
