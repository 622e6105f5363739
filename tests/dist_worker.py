"""Two-process jax.distributed worker (driven by test_distributed.py).

The working analog of the reference's actual multi-process entry
(`dist.init_process_group(backend="nccl")` + MASTER_ADDR/PORT/RANK/
WORLD_SIZE rendezvous, /root/reference/train.py:698-711): each process
contributes 2 virtual CPU devices, `initialize_distributed` performs the
rendezvous, and a hybrid (DCN x ICI) mesh runs one sharded train step whose
loss must be identical on every process.

Usage: python dist_worker.py <coordinator> <num_procs> <rank>
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
                               " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass


def main():
    coordinator, num_procs, rank = (sys.argv[1], int(sys.argv[2]),
                                    int(sys.argv[3]))

    from kosmosx_tpu.parallel.mesh import initialize_distributed, make_hybrid_mesh

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=rank)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 2 * num_procs, jax.devices()

    # hybrid mesh: DCN axis = process boundary (dcn_data=2), ICI = the 2
    # local devices as fsdp
    mesh = make_hybrid_mesh(dcn_data=num_procs, data=1, fsdp=2, tensor=1)
    assert mesh.devices.shape == (num_procs, 2, 1, 1), mesh.devices.shape

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kosmosx_tpu.core.config import MagnetoConfig
    from kosmosx_tpu.nn import decoder as dec
    from kosmosx_tpu.parallel.sharding import param_specs
    from kosmosx_tpu.train.loss import next_token_loss

    cfg = MagnetoConfig(vocab_size=64, embed_dim=32, ffn_dim=64, layers=2,
                        heads=4, max_positions=64, multiway=False,
                        dropout=0.0, attention_dropout=0.0,
                        use_flash_attention=False)

    # identical on every process (same seed), placed as GLOBAL arrays
    params_host = jax.tree_util.tree_map(
        np.asarray, dec.init_decoder(jax.random.PRNGKey(0), cfg))
    tokens_host = np.random.RandomState(7).randint(
        4, cfg.vocab_size, size=(4, 16)).astype(np.int32)

    pspecs = param_specs(params_host)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, s), lambda idx: x[idx]),
        params_host, pspecs)
    batch_sharding = NamedSharding(mesh, P(("data", "fsdp")))
    tokens = jax.make_array_from_callback(
        tokens_host.shape, batch_sharding, lambda idx: tokens_host[idx])

    opt = optax.sgd(0.1)
    opt_state_host = opt.init(params_host)

    def opt_spec(leaf):
        for ph, s in zip(jax.tree_util.tree_leaves(params_host),
                         jax.tree_util.tree_leaves(pspecs)):
            if getattr(leaf, "shape", None) == ph.shape:
                return s
        return P()

    opt_specs = jax.tree_util.tree_map(opt_spec, opt_state_host)
    opt_state = jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_callback(
            np.shape(x), NamedSharding(mesh, s),
            lambda idx: np.asarray(x)[idx]),
        opt_state_host, opt_specs)

    @jax.jit
    def step(params, opt_state, tokens):
        def loss_fn(p):
            logits = dec.decoder_forward(p, tokens, cfg)
            return next_token_loss(logits, tokens)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = None
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, tokens)
        lv = float(loss)  # replicated -> addressable on every process
        if loss0 is None:
            loss0 = lv
    assert lv < loss0, (lv, loss0)  # training moved
    print(f"RANK{rank} OK loss0={loss0:.6f} loss2={lv:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
