import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emrt_tpu.models.deformable_transformer import (EncoderDecoder,
                                                    MSDeformableAttention,
                                                    levels_to_tokens,
                                                    tokens_to_levels)
from emrt_tpu.models.position_encoding import (encoder_reference_points,
                                               sine_position_embedding)


def test_sine_position_embedding_matches_reference_formula():
    """Scalar re-derivation of position_encoding.py:59-75 with all-ones mask."""
    h, w, npf = 3, 4, 8
    got = np.asarray(sine_position_embedding(h, w, npf)).reshape(h, w, 2 * npf)
    scale = 2 * np.pi
    eps = 1e-6
    dim_t = 10000.0 ** (2 * (np.arange(npf) // 2) / npf)
    for i in range(h):
        for j in range(w):
            y = (i + 1 - 0.5) / (h + eps) * scale
            x = (j + 1 - 0.5) / (w + eps) * scale
            py, px = y / dim_t, x / dim_t
            exp_y = np.stack([np.sin(py[0::2]), np.cos(py[1::2])], 1).reshape(-1)
            exp_x = np.stack([np.sin(px[0::2]), np.cos(px[1::2])], 1).reshape(-1)
            np.testing.assert_allclose(got[i, j, :npf], exp_y, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(got[i, j, npf:], exp_x, rtol=1e-5, atol=1e-6)


def test_encoder_reference_points_grid():
    refs = np.asarray(encoder_reference_points(((2, 2), (1, 1))))
    assert refs.shape == (5, 2, 2)
    # first token of the 2x2 level: center (0.5/2, 0.5/2)
    np.testing.assert_allclose(refs[0, 0], [0.25, 0.25])
    np.testing.assert_allclose(refs[3, 0], [0.75, 0.75])
    # the 1x1 level token: center (0.5, 0.5)
    np.testing.assert_allclose(refs[4, 0], [0.5, 0.5])


def test_tokens_levels_roundtrip():
    shapes = ((4, 4), (2, 2))
    x = jnp.arange(2 * 20 * 3, dtype=jnp.float32).reshape(2, 20, 3)
    maps = tokens_to_levels(x, shapes)
    assert maps[0].shape == (2, 4, 4, 3) and maps[1].shape == (2, 2, 2, 3)
    back = levels_to_tokens(maps)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_ms_deformable_attention_init_and_shape():
    module = MSDeformableAttention(embed_dim=32, num_heads=4, num_levels=2,
                                   num_points=3)
    shapes = ((4, 4), (2, 2))
    lv = 20
    q = jnp.ones((2, 5, 32))
    ref = jnp.full((2, 5, 2, 2), 0.5)
    v = jnp.ones((2, lv, 32))
    vars_ = module.init(jax.random.key(0), q, ref, v, shapes)
    out = module.apply(vars_, q, ref, v, shapes)
    assert out.shape == (2, 5, 32)
    # offsets kernel must init to zeros, bias to the rotated grid
    k = vars_["params"]["sampling_offsets"]["kernel"]
    b = vars_["params"]["sampling_offsets"]["bias"]
    assert float(jnp.abs(k).max()) == 0.0
    b = np.asarray(b).reshape(4, 2, 3, 2)
    # head 0 points along (cos0, sin0) = (1, 0), scaled 1..3
    np.testing.assert_allclose(b[0, 0, :, 0], [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(b[0, 0, :, 1], [0, 0, 0], atol=1e-5)


@pytest.mark.slow
def test_encoder_decoder_shapes():
    module = EncoderDecoder(num_queries=5, hidden_dim=32, nhead=4,
                            num_feature_levels=2, num_encoder_layers=1,
                            num_decoder_layers=1, num_encoder_points=2,
                            num_decoder_points=2, dim_feedforward=64)
    feats = [jnp.ones((2, 4, 4, 8)), jnp.ones((2, 2, 2, 16))]
    psp = jnp.ones((2, 5, 32))
    vars_ = module.init({"params": jax.random.key(0)}, feats, psp)
    hs, memory = module.apply(vars_, feats, psp)
    assert hs.shape == (2, 5, 32)
    assert memory.shape == (2, 20, 32)


@pytest.mark.slow
def test_emrt_forward_shapes():
    from emrt_tpu.models.emrt import EMRT
    model = EMRT(num_classes=6, backbone="resnet50")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    main, aux = model.apply(vars_, x, train=False)
    assert main.shape == (1, 64, 64, 6)
    assert aux.shape == (1, 64, 64, 6)


@pytest.mark.slow
def test_learned_position_embedding_encdec():
    """'learned' position_embed_type builds row/col tables and runs
    (reference transformer_encoder_decoder.py:340-348,
    position_encoding.py:45-48)."""
    import jax
    import jax.numpy as jnp
    from emrt_tpu.models.deformable_transformer import EncoderDecoder

    encdec = EncoderDecoder(num_encoder_layers=1, num_decoder_layers=1,
                            position_embed_type="learned")
    feats = [jnp.zeros((1, 8, 8, 256)), jnp.zeros((1, 4, 4, 256)),
             jnp.zeros((1, 2, 2, 256))]
    psp = jnp.zeros((1, 110, 256))
    variables = encdec.init(jax.random.key(0), feats, psp)
    emb = variables["params"]["position_embedding"]
    assert emb["row_embed"]["embedding"].shape == (50, 128)
    assert emb["col_embed"]["embedding"].shape == (50, 128)
    hs, mem = encdec.apply(variables, feats, psp)
    assert hs.shape == (1, 110, 256) and mem.shape == (1, 84, 256)


@pytest.mark.slow
def test_tensor_parallel_train_step():
    """PARALLEL.MODEL=2: Megatron-style TP shardings on the transformer
    projections compile and run the full train step on a dp4 x tp2 mesh,
    and the loss matches the replicated run."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from emrt_tpu.config import get_config
    from emrt_tpu.losses import get_loss_function
    from emrt_tpu.models import get_model
    from emrt_tpu.parallel import (batch_sharding, create_mesh, replicated,
                                   tp_shard_params)
    from emrt_tpu.solver import get_optimizer, get_scheduler
    from emrt_tpu.train import make_train_step
    from emrt_tpu.train.state import TrainState, init_variables

    cfg = get_config()
    cfg.DATA.DATASET = "Synthetic"
    cfg.DATA.NUM_CLASSES = 4
    cfg.DATA.CROP_SIZE = (32, 32)
    cfg.MODEL.NAME = "EMRT"
    cfg.MODEL.ENCODER.TYPE = "resnet50"
    cfg.MODEL.OUTPUT_STRIDE = 32
    cfg.TRAIN.OPTIMIZER.GRAD_CLIP = 1.0

    model = get_model(cfg, use_pallas=False)
    batch = {
        "image": jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (8, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(np.random.default_rng(1).integers(
            0, 4, (8, 32, 32)).astype(np.int32)),
    }
    variables = init_variables(model, jax.random.key(0), batch["image"])
    schedule = get_scheduler(cfg)
    loss_fn = get_loss_function(cfg)

    def run(params_fn, mesh):
        params = params_fn(variables["params"])
        tx = get_optimizer(cfg, schedule, params=params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=jax.device_put(
                               variables.get("batch_stats", {}),
                               replicated(mesh)),
                           opt_state=tx.init(params), tx=tx)
        b = jax.device_put(batch, batch_sharding(mesh))
        step = make_train_step(model, loss_fn, donate=False)
        state, metrics = step(state, b, jax.random.key(1))
        return float(metrics["loss"]), state

    mesh_tp = create_mesh(data=4, model=2)
    loss_tp, state_tp = run(lambda p: tp_shard_params(p, mesh_tp), mesh_tp)
    mesh_dp = create_mesh(data=8, model=1)
    loss_dp, _ = run(lambda p: jax.device_put(p, replicated(mesh_dp)), mesh_dp)
    # K-split partial sums (reduce-scatter) reorder float accumulation and
    # the norms amplify it; wiring bugs would show O(1) differences
    assert abs(loss_tp - loss_dp) < 2e-2

    # the FFN up-projection really is sharded over the model axis
    k = state_tp.params["encoder_decoder"]["encoder_layer0"]["linear1"]["kernel"]
    assert k.sharding.spec == P(None, "model")

    # PARALLEL.SPATIAL=2: image H sharded over 'spatial' (GSPMD conv halo
    # exchange path) — same step, same loss as the replicated run
    from emrt_tpu.parallel import spatial_batch_sharding
    mesh_sp = create_mesh(data=4, model=1, spatial=2)
    params_sp = jax.device_put(variables["params"], replicated(mesh_sp))
    tx = get_optimizer(cfg, schedule, params=params_sp)
    state_sp = TrainState(step=jnp.zeros((), jnp.int32), params=params_sp,
                          batch_stats=jax.device_put(
                              variables.get("batch_stats", {}),
                              replicated(mesh_sp)),
                          opt_state=tx.init(params_sp), tx=tx)
    b_sp = jax.device_put(batch, spatial_batch_sharding(mesh_sp))
    assert b_sp["image"].sharding.spec == P("data", "spatial")
    step = make_train_step(model, loss_fn, donate=False)
    _, metrics_sp = step(state_sp, b_sp, jax.random.key(1))
    assert abs(float(metrics_sp["loss"]) - loss_dp) < 2e-2
