import jax.numpy as jnp
import numpy as np

from lina_speech_tpu.ops import (
    delay_rvq,
    undelay_rvq,
    sequence_mask,
    packmask_2d,
    packed_reset_mask,
    pad_2d_sequence,
)


def test_delay_rvq_single_quantizer():
    code = jnp.arange(10, 15)[None, :]  # (1, 5)
    out = delay_rvq(code, head_token=1, tail_token=2)
    assert out.shape == (1, 7)
    np.testing.assert_array_equal(np.asarray(out[0]), [1, 10, 11, 12, 13, 14, 2])


def test_delay_undelay_roundtrip():
    q, n, b = 3, 8, 2
    code = jnp.arange(q * n).reshape(q, n) + 10
    delayed = delay_rvq(code, head_token=1, tail_token=2)
    assert delayed.shape == (q, n + q + 1)
    # head triangle: quantizer i has i+1 head tokens at the front
    for i in range(q):
        np.testing.assert_array_equal(np.asarray(delayed[i, : i + 1]), [1] * (i + 1))
    batch = jnp.stack([delayed] * b, axis=1)  # (q, b, t)
    rec = undelay_rvq(batch)
    assert rec.shape == (q, b, n)
    np.testing.assert_array_equal(np.asarray(rec[:, 0]), np.asarray(code))


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]]
    )


def test_packmask_2d_blocks():
    m = packmask_2d([2, 3], [3, 2])
    assert m.shape == (5, 5)
    np.testing.assert_array_equal(m[:2, :3], np.ones((2, 3), bool))
    np.testing.assert_array_equal(m[:2, 3:], np.zeros((2, 2), bool))
    np.testing.assert_array_equal(m[2:, 3:], np.ones((3, 2), bool))
    np.testing.assert_array_equal(m[2:, :3], np.zeros((3, 3), bool))


def test_packmask_2d_offset():
    m = packmask_2d([1, 1], [2, 2], offset=1)
    np.testing.assert_array_equal(m[0], [1, 1, 1, 0])
    np.testing.assert_array_equal(m[1], [0, 1, 1, 1])


def test_packed_reset_mask():
    m = packed_reset_mask([3, 2, 4])
    np.testing.assert_array_equal(m, [1, 0, 0, 1, 0, 1, 0, 0, 0])


def test_pad_2d_sequence():
    a = np.ones((2, 3), np.int32)
    b = np.ones((3, 1), np.int32) * 2
    out = pad_2d_sequence([a, b], padding_value=9)
    assert out.shape == (2, 3, 3)
    assert out[0, 0, 0] == 1 and out[0, 1, 2] == 1
    assert out[1, 2, 0] == 2 and out[1, 0, 1] == 9


def test_topk_sampling_reference_compat_mode():
    """reference_compat replicates model/tools.py:38-44's quirk: the top-k
    cutoff comes from UNSCALED logits but is compared against scaled ones,
    so at temp < 1 more than k candidates survive."""
    import jax
    import numpy as np
    from lina_speech_tpu.ops.sampling import topk_sampling

    logits = jnp.asarray([[2.0, 1.9, 1.0, -10.0]])
    ks = jax.random.split(jax.random.PRNGKey(0), 200)

    std = np.asarray([topk_sampling(k, logits, k=2, temp=0.5)[0] for k in ks])
    cmp_ = np.asarray([
        topk_sampling(k, logits, k=2, temp=0.5, reference_compat=True)[0]
        for k in ks
    ])
    assert set(np.unique(std)) <= {0, 1}          # standard: exactly top-2
    assert 2 in np.unique(cmp_)                   # compat: index 2 leaks in
    assert 3 not in np.unique(cmp_)               # far tail still masked
