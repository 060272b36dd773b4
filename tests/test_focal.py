"""Golden tests for the Focal Transformer attention against a brute-force
per-window oracle derived independently from the reference semantics
(focal_transformer.py:87-390): explicit python loops build each window's
key set — own tokens, the four rolled rings filtered by the outside-the-
window masks, and the unfolded pooled neighborhoods with -100 border
masks — then plain numpy attention."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emrt_tpu.models.backbones.focal import FocalAttention


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _oracle(fine, pooled, params, *, ws, e, fw, nh):
    """Reference-semantics focal attention, one window at a time."""
    b, h, w, c = fine.shape
    hd = c // nh
    scale = hd ** -0.5
    wk = np.asarray(params["qkv"]["kernel"], np.float32)
    wb = np.asarray(params["qkv"]["bias"], np.float32)
    pk = np.asarray(params["proj"]["kernel"], np.float32)
    pb = np.asarray(params["proj"]["bias"], np.float32)
    rpbt = np.asarray(params["relative_position_bias_table"], np.float32)
    nbias = np.asarray(
        params["relative_position_bias_table_to_neighbors"], np.float32)
    wtab = np.asarray(
        params["relative_position_bias_table_to_windows0"], np.float32)

    def qkv(m):
        out = m.astype(np.float32) @ wk + wb
        return out[..., :c], out[..., c:2 * c], out[..., 2 * c:]

    qf, kf, vf = qkv(fine)
    kp, vp = qkv(pooled)[1:]

    # rolled-ring validity masks, straight from the reference (:140-150)
    m_tl = np.ones((ws, ws)); m_tl[:-e, :-e] = 0
    m_tr = np.ones((ws, ws)); m_tr[:-e, e:] = 0
    m_bl = np.ones((ws, ws)); m_bl[e:, :-e] = 0
    m_br = np.ones((ws, ws)); m_br[e:, e:] = 0
    roll_masks = [m_tl, m_tr, m_bl, m_br]
    rolls = [(-e, -e), (-e, e), (e, -e), (e, e)]

    # swin relative position bias, re-derived with explicit loops
    def win_bias(qi, qj, ki, kj):
        return rpbt[(qi - ki + ws - 1) * (2 * ws - 1) + (qj - kj + ws - 1)]

    kernel = 2 * (fw // 2) + 1          # level k=0: stride 1, pad kernel//2
    fr = fw
    pad = kernel // 2
    nwh, nww = pooled.shape[1], pooled.shape[2]

    outs = []
    for bi in range(b):
        for wi in range(h // ws):
            for wj in range(w // ws):
                ks, vs, biases = [], [], []
                # own window tokens + swin bias
                qs = []
                for qi in range(ws):
                    for qj in range(ws):
                        qs.append(qf[bi, wi * ws + qi, wj * ws + qj])
                for ki_ in range(ws):
                    for kj_ in range(ws):
                        ks.append(kf[bi, wi * ws + ki_, wj * ws + kj_])
                        vs.append(vf[bi, wi * ws + ki_, wj * ws + kj_])
                        biases.append(np.stack(
                            [win_bias(qi, qj, ki_, kj_)
                             for qi in range(ws) for qj in range(ws)]))
                # rolled rings: token t of roll r is rolled_map[win + t]
                slot = 0
                for (dy, dx), mask in zip(rolls, roll_masks):
                    kr = np.roll(kf[bi], (dy, dx), (0, 1))
                    vr = np.roll(vf[bi], (dy, dx), (0, 1))
                    for ti in range(ws):
                        for tj in range(ws):
                            if mask[ti, tj] == 0:
                                continue
                            ks.append(kr[wi * ws + ti, wj * ws + tj])
                            vs.append(vr[wi * ws + ti, wj * ws + tj])
                            biases.append(nbias[0, :, :, slot].T)
                            slot += 1
                # pooled neighborhood around (wi, wj), zero-pad + -100 mask
                widx = wi * nww + wj   # unused; windows iterate row-major
                for ki_ in range(kernel):
                    for kj_ in range(kernel):
                        pi, pj = wi + ki_ - pad, wj + kj_ - pad
                        inb = 0 <= pi < nwh and 0 <= pj < nww
                        ks.append(kp[bi, pi, pj] if inb
                                  else np.zeros(c, np.float32))
                        vs.append(vp[bi, pi, pj] if inb
                                  else np.zeros(c, np.float32))
                        bias_qk = np.stack(
                            [wtab[:, (qi - ki_ + fr - 1) * (ws + fr - 1)
                                  + (qj - kj_ + fr - 1)]
                             for qi in range(ws) for qj in range(ws)])
                        if not inb:
                            bias_qk = bias_qk - 100.0
                        biases.append(bias_qk)

                q = np.stack(qs).reshape(ws * ws, nh, hd)
                k = np.stack(ks).reshape(-1, nh, hd)
                v = np.stack(vs).reshape(-1, nh, hd)
                bias = np.stack(biases, 1)            # [ws^2, N, nh]
                attn = (np.einsum("qhd,khd->hqk", q * scale, k)
                        + bias.transpose(2, 0, 1))
                attn = _softmax(attn, -1)
                o = np.einsum("hqk,khd->qhd", attn, v).reshape(ws * ws, c)
                outs.append(o @ pk + pb)
    return np.stack(outs)


@pytest.mark.parametrize("ws,e,fw", [(4, 1, 3), (4, 2, 5)])
def test_focal_attention_matches_bruteforce_oracle(ws, e, fw):
    nh, c = 2, 8
    h = w = 2 * ws
    rng = np.random.default_rng(0)
    fine = rng.normal(size=(1, h, w, c)).astype(np.float32)
    pooled = rng.normal(size=(1, h // ws, w // ws, c)).astype(np.float32)

    m = FocalAttention(dim=c, num_heads=nh, window_size=ws, expand_size=e,
                       focal_window=fw, focal_level=2)
    v = m.init({"params": jax.random.key(0)},
               [jnp.asarray(fine), jnp.asarray(pooled)])
    got = np.asarray(m.apply(v, [jnp.asarray(fine), jnp.asarray(pooled)]))
    want = _oracle(fine, pooled, jax.tree.map(np.asarray, v["params"]),
                   ws=ws, e=e, fw=fw, nh=nh)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_focal_rolled_key_count():
    # 4*ws^2 - 4*(ws-e)^2 ring tokens (focal_transformer.py:129-132)
    from emrt_tpu.models.backbones.focal import _valid_ind_rolled
    for ws, e in ((7, 3), (4, 1), (4, 2)):
        assert len(_valid_ind_rolled(ws, e)) == 4 * ws * ws - 4 * (ws - e) ** 2
