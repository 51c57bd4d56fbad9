"""Order-conditioned DiT variants: host index computation + model forward."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.order_dit import (
    ConcatOrderDiT,
    ConcatOrderDiT2,
    compute_order_indices,
    compute_order_insertion,
)


def test_compute_order_indices():
    # [CLS] tok tok | tok [SEP] pad
    ids = np.asarray([[101, 5, 6, 1064, 7, 102, 0]])
    orders = [[2, 9]]
    out = compute_order_indices(ids, orders)
    # specials -> -1; first object's tokens get order 2; after '|' -> order 9
    np.testing.assert_array_equal(out[0], [-1, 2, 2, -1, 9, -1, -1])


def test_compute_order_insertion():
    ids = np.asarray([[101, 5, 1064, 7, 102]])
    orders = [[3]]
    src, oid = compute_order_insertion(ids, orders, max_objs=2, pad_order=100)
    assert src.shape == (1, 7)
    # order token inserted at the '|' position, before gathering token 2
    row_src = list(src[0])
    assert -1 in row_src
    ins = row_src.index(-1)
    assert oid[0, ins] == 3
    # every caption token appears exactly once in the gather map
    gathered = [s for s in row_src if s >= 0]
    assert sorted(gathered) == [0, 1, 2, 3, 4]


def test_order_dit_forward_and_order_sensitivity():
    model = ConcatOrderDiT(in_channels=4, context_dim=8, hidden_size=32,
                           depth=1, num_heads=4, max_len=64, num_orders=10)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 8, 4))
    t = jnp.asarray([10])
    tok = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8))
    idx1 = jnp.asarray([[0, 1, -1, 2, -1]], dtype=jnp.int32)
    idx2 = jnp.asarray([[2, 1, -1, 0, -1]], dtype=jnp.int32)
    params = model.init(rng, x, t, tok, idx1)
    o1 = model.apply(params, x, t, tok, idx1)
    assert o1.shape == (1, 8, 4)
    # randomize so zero-init proj_out doesn't mask the order signal
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree.unflatten(
        td, [0.3 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )
    o1 = model.apply(params, x, t, tok, idx1)
    o2 = model.apply(params, x, t, tok, idx2)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-6


def test_order_dit2_forward():
    model = ConcatOrderDiT2(in_channels=4, context_dim=8, hidden_size=32,
                            depth=1, num_heads=4, max_len=64)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 4))
    t = jnp.zeros((1,))
    tok = jax.random.normal(rng, (1, 5, 8))
    ids = np.asarray([[101, 5, 1064, 7, 102]])
    src, oid = compute_order_insertion(ids, [[3]], max_objs=2)
    params = model.init(rng, x, t, tok, jnp.asarray(src), jnp.asarray(oid))
    out = model.apply(params, x, t, tok, jnp.asarray(src), jnp.asarray(oid))
    assert out.shape == (1, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_struct_caption_parsing():
    from audiolcm_tpu.data.struct_captions import (
        build_order_dict,
        parse_struct_captions,
    )

    table = build_order_dict()
    assert table["order 0 start"] == 0
    assert table["order 1 mid"] == 4
    assert table["all"] == 30 and table["unknown"] == 31

    texts, orders = parse_struct_captions(
        ["<man speaking& order 1 start>@<idle engine& all>", "<dog& all>"]
    )
    assert texts == ["man speaking | idle engine |", "dog |"]
    assert orders == [[3, 30], [30]]

    texts, orders = parse_struct_captions(["<dog& start>"], time_only=True)
    assert orders == [[1]]
