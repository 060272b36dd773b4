import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from emrt_tpu.utils.checkpoint import _interp_pos_embed, load_pretrained_model


def test_interp_pos_embed_identity():
    v = np.random.default_rng(0).standard_normal((1, 17, 8)).astype(np.float32)
    out = _interp_pos_embed(v, (1, 17, 8))
    assert out.shape == (1, 17, 8)
    np.testing.assert_allclose(out[:, :1], v[:, :1])


def test_interp_pos_embed_resize():
    v = np.random.default_rng(0).standard_normal((1, 17, 8)).astype(np.float32)  # 4x4 grid + cls
    out = _interp_pos_embed(v, (1, 65, 8))  # 8x8 grid + cls
    assert out.shape == (1, 65, 8)
    np.testing.assert_allclose(out[:, 0], v[:, 0])  # cls preserved


def test_load_pretrained_partial_and_interp(tmp_path):
    # "checkpoint" trained at 4x4 token grid; target model uses 8x8
    src_params = {
        "encoder": {"pos_embed": np.random.default_rng(1)
                    .standard_normal((1, 17, 8)).astype(np.float32),
                    "dense": {"kernel": np.ones((8, 8), np.float32)}},
        "head": {"kernel": np.ones((8, 4), np.float32)},
    }
    ckptr = ocp.StandardCheckpointer()
    path = str(tmp_path / "ckpt")
    ckptr.save(path, {"params": src_params})
    ckptr.wait_until_finished()

    target = {
        "encoder": {"pos_embed": np.zeros((1, 65, 8), np.float32),
                    "dense": {"kernel": np.zeros((8, 8), np.float32)}},
        "head": {"kernel": np.zeros((8, 5), np.float32)},  # mismatched: skipped
    }
    new_params, _ = load_pretrained_model(path, target)
    assert new_params["encoder"]["pos_embed"].shape == (1, 65, 8)
    assert float(np.abs(new_params["encoder"]["pos_embed"]).sum()) > 0
    np.testing.assert_allclose(new_params["encoder"]["dense"]["kernel"], 1.0)
    np.testing.assert_allclose(new_params["head"]["kernel"], 0.0)  # skipped


def test_best_miou_persisted_across_manager_restarts(tmp_path):
    from emrt_tpu.utils.checkpoint import CheckpointManager

    class S:
        params = {"w": np.ones((2,), np.float32)}
        batch_stats = {}

    mgr = CheckpointManager(str(tmp_path), max_to_keep=1)
    assert mgr.save_best(S(), 0.7)
    # a fresh manager (e.g. after --resume) must not let a worse mIoU win
    mgr2 = CheckpointManager(str(tmp_path), max_to_keep=1)
    assert mgr2.best_miou == 0.7
    assert not mgr2.save_best(S(), 0.5)
    assert mgr2.save_best(S(), 0.8)
