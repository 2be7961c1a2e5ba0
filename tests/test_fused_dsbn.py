"""Vectorized (segment-stat) DSBN must equal the per-sub-batch loop."""
import numpy as np
import jax
import jax.numpy as jnp

from ramdsir_tpu.models import DomainSpecificBatchNorm, RecDecoder


def test_segment_dsbn_matches_looped():
    dsbn = DomainSpecificBatchNorm(6, num_domains=3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, (9, 5, 5, 6)).astype(np.float32))
    bsl = [2, 3, 4]
    domains = jnp.asarray(np.repeat(np.arange(3), bsl), jnp.int32)

    v = dsbn.init(jax.random.PRNGKey(0), x[:2], jnp.int32(0), use_running_average=False)
    # randomize affine so routing errors show
    v = {"params": {"scale": jnp.asarray(rng.normal(1, 0.2, (3, 6)), jnp.float32),
                    "bias": jnp.asarray(rng.normal(0, 0.2, (3, 6)), jnp.float32)},
         "batch_stats": v["batch_stats"]}

    # looped reference path
    outs, stats = [], v["batch_stats"]
    left = 0
    for d, bs in enumerate(bsl):
        y, mut = dsbn.apply(
            {"params": v["params"], "batch_stats": stats},
            x[left : left + bs], jnp.int32(d),
            use_running_average=False, mutable=["batch_stats"],
        )
        outs.append(y)
        stats = mut["batch_stats"]
        left += bs
    want = jnp.concatenate(outs, axis=0)

    got, mut = dsbn.apply(v, x, domains, use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_segment_dsbn_eval_mode_uses_banks():
    dsbn = DomainSpecificBatchNorm(4, num_domains=2)
    x = jnp.ones((4, 3, 3, 4))
    v = dsbn.init(jax.random.PRNGKey(0), x[:1], jnp.int32(0), use_running_average=False)
    stats = {"mean": jnp.asarray([[0.0] * 4, [1.0] * 4]), "var": jnp.ones((2, 4))}
    domains = jnp.asarray([0, 0, 1, 1], jnp.int32)
    y = dsbn.apply(
        {"params": v["params"], "batch_stats": stats}, x, domains, use_running_average=True
    )
    y = np.asarray(y)
    assert abs(y[0, 0, 0, 0] - 1.0) < 1e-4  # (1-0)/1
    assert abs(y[2, 0, 0, 0] - 0.0) < 1e-4  # (1-1)/1


def test_rec_decoder_fused_matches_looped():
    rec = RecDecoder(num_classes=3, norm="dsbn", num_domains=3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(9, 4, 4, 256)).astype(np.float32))
    bsl = [2, 3, 4]
    v = rec.init(jax.random.PRNGKey(0), x[:2], domain=jnp.int32(0), train=False)

    outs, stats = [], v["batch_stats"]
    left = 0
    for d, bs in enumerate(bsl):
        y, mut = rec.apply(
            {"params": v["params"], "batch_stats": stats},
            x[left : left + bs], domain=jnp.int32(d), train=True, mutable=["batch_stats"],
        )
        outs.append(y)
        stats = mut["batch_stats"]
        left += bs
    want = jnp.concatenate(outs, axis=0)

    domains = jnp.asarray(np.repeat(np.arange(3), bsl), jnp.int32)
    got, mut = rec.apply(v, x, domain=domains, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-4)
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)
