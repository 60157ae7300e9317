"""Multi-process (multi-host) smoke check: one sharded train step.

Run as one process per "host" (works on CPU with gloo collectives, so the
multi-host path is testable without a TPU pod — tests/test_multihost.py):

    python -m insv2v_tpu.parallel.multihost_check <process_id> <num_processes> <port>

Each process contributes 2 virtual CPU devices; the dp mesh spans all
processes, the batch is assembled with
``jax.make_array_from_process_local_data``, grads are averaged by XLA
collectives across hosts, and every process prints the (identical)
resulting loss. Validates the reference's ``--nnode`` multi-node training
surface (main.py:18-19,59) on our stack.
"""

from __future__ import annotations

import os
import sys


def run(process_id: int, num_processes: int, port: int,
        devices_per_process: int = 2) -> float:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_process}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # newer jax enables cross-process CPU collectives by default

    from insv2v_tpu.parallel.mesh import (
        init_distributed,
        make_global_batch,
        make_mesh,
    )

    init_distributed(f"127.0.0.1:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == devices_per_process * num_processes, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
    from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig
    from insv2v_tpu.training.trainer import TrainConfig, Trainer

    mesh = make_mesh()
    unet = UNet3DConditionModel(cfg=UNetConfig.tiny(in_channels=8,
                                                    out_channels=4))
    vae = AutoencoderKL(cfg=VaeConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                                      z_channels=4, embed_dim=4,
                                      resolution=16))
    clip = ClipTextEncoder(ClipTextConfig(vocab_size=64, hidden_size=12,
                                          num_layers=1, num_heads=2,
                                          intermediate_size=24))
    k = jax.random.PRNGKey(0)
    unet_p = unet.init(k, jnp.zeros((1, 2, 8, 8, 8)),
                       jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 77, 12)))["params"]
    vae_p = vae.init(k, jnp.zeros((1, 16, 16, 3)),
                     sample_posterior=False)["params"]
    clip_p = clip.init(k, jnp.zeros((1, 77), jnp.int32))["params"]

    trainer = Trainer(unet, vae, clip,
                      TrainConfig(accumulate_grad_batches=2), mesh=mesh)
    state = trainer.place_state(trainer.create_state(unet_p, vae_p, clip_p))

    # every process feeds its local slice of the global batch; use the
    # SAME underlying global data so the loss is deterministic
    n_total = 2 * n_global  # accum 2 x micro 1 per device
    rs = np.random.RandomState(0)
    full = {
        "input_video": rs.randn(n_total, 2, 16, 16, 3).astype(np.float32),
        "edited_video": rs.randn(n_total, 2, 16, 16, 3).astype(np.float32),
        "prompt_ids": rs.randint(0, 64, (n_total, 77)).astype(np.int32),
    }
    per_proc = n_total // num_processes
    local = {k_: v[process_id * per_proc:(process_id + 1) * per_proc]
             for k_, v in full.items()}
    batch = make_global_batch(mesh, local)

    step = trainer.jitted_step(state)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["train_loss"])
    assert np.isfinite(loss), loss
    assert int(new_state.step) == 1
    # the adam state must come out really dp-sharded across processes
    # (ZeRO-2 regression guard, VERDICT r4 #7)
    from insv2v_tpu.parallel.mesh import assert_zero_sharded

    assert_zero_sharded(new_state.opt_state, mesh)
    return loss


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pid, nproc, port = int(argv[0]), int(argv[1]), int(argv[2])
    loss = run(pid, nproc, port)
    print(f"MULTIHOST_OK process={pid}/{nproc} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
