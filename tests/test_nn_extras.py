"""Library-parity extras: functional ops, freezer, MSG/Avg SA variants."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regnet_for_3d_grasping_tpu.nn.freezer import (
    freeze_mask,
    frozen_optimizer,
)
from regnet_for_3d_grasping_tpu.nn.functional import (
    encode_one_hot,
    smooth_cross_entropy,
)
from regnet_for_3d_grasping_tpu.models.backbone import (
    SetAbstractionAvg,
    SetAbstractionMSG,
)


class TestFunctional:
    def test_one_hot(self):
        got = np.asarray(encode_one_hot(jnp.array([0, 2]), 3))
        np.testing.assert_array_equal(got, [[1, 0, 0], [0, 0, 1]])

    def test_smooth_ce_matches_plain_at_zero_smoothing(self, rng):
        logits = jnp.asarray(rng.randn(8, 5).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 5, 8))
        got = float(smooth_cross_entropy(logits, labels, 0.0))
        expect = float(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean())
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_smoothing_increases_uncertain_loss(self, rng):
        logits = jnp.asarray(rng.randn(8, 5).astype(np.float32) * 5)
        labels = jnp.argmax(logits, -1)
        plain = float(smooth_cross_entropy(logits, labels, 0.0))
        smooth = float(smooth_cross_entropy(logits, labels, 0.2))
        assert smooth > plain


class TestFreezer:
    def test_mask_and_updates(self):
        params = {"score_net": {"w": jnp.ones(3)},
                  "grn_head": {"w": jnp.ones(3)}}
        mask = freeze_mask(params, [r"^score_net"])
        assert mask["score_net"]["w"] is True
        assert mask["grn_head"]["w"] is False
        opt = frozen_optimizer(optax.sgd(0.1), params, [r"^score_net"])
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        upd, _ = opt.update(grads, state, params)
        assert np.all(np.asarray(upd["score_net"]["w"]) == 0)
        assert np.all(np.asarray(upd["grn_head"]["w"]) != 0)


class TestSAVariants:
    def _pc(self, rng):
        xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        feat = jnp.asarray(rng.rand(2, 64, 4).astype(np.float32))
        return xyz, feat

    def test_msg_shapes(self, rng):
        xyz, feat = self._pc(rng)
        m = SetAbstractionMSG(num_centroids=16, radii=(0.2, 0.4),
                              num_neighbours=(4, 8),
                              mlp_channels=((8, 8), (8, 16)))
        v = m.init(jax.random.PRNGKey(0), xyz, feat)
        nx, nf = m.apply(v, xyz, feat)
        assert nx.shape == (2, 16, 3)
        assert nf.shape == (2, 16, 8 + 16)   # concat across scales

    def test_avg_shapes(self, rng):
        xyz, feat = self._pc(rng)
        m = SetAbstractionAvg(num_centroids=16, radius=0.3,
                              num_neighbours=8, mlp_channels=(8, 8))
        v = m.init(jax.random.PRNGKey(0), xyz, feat)
        nx, nf = m.apply(v, xyz, feat)
        assert nx.shape == (2, 16, 3)
        assert nf.shape == (2, 16, 8)


class TestEdgeVariants:
    """Edge* family (reference modules.py:65-95,137-173,408-477,515-549 —
    dead code in REGNet's forward path, built for library parity)."""

    def _pc(self, rng):
        xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        feat = jnp.asarray(rng.rand(2, 64, 4).astype(np.float32))
        return xyz, feat

    def test_edge_sa_shapes_and_edge_signal(self, rng):
        from regnet_for_3d_grasping_tpu.models.edge import (
            EdgeSetAbstraction)
        xyz, feat = self._pc(rng)
        m = EdgeSetAbstraction(num_centroids=16, radius=0.3,
                               num_neighbours=8, mlp_channels=(8, 8))
        v = m.init(jax.random.PRNGKey(0), xyz, feat)
        nx, nf = m.apply(v, xyz, feat)
        assert nx.shape == (2, 16, 3)
        assert nf.shape == (2, 16, 8)
        # input channels = 3 (xyz) + C + C (edge): kernel rows = 11
        k = v["params"]["mlp"]["layer0"]["dense"]["kernel"]
        assert k.shape[0] == 3 + 4 + 4

    def test_edge_fp_shapes(self, rng):
        from regnet_for_3d_grasping_tpu.models.edge import (
            EdgeFeaturePropagation)
        xyz, feat = self._pc(rng)
        sparse_xyz = xyz[:, :16]
        sparse_feat = jnp.asarray(rng.rand(2, 16, 6).astype(np.float32))
        m = EdgeFeaturePropagation(mlp_channels=(8, 8))
        v = m.init(jax.random.PRNGKey(0), xyz, sparse_xyz, feat,
                   sparse_feat)
        out = m.apply(v, xyz, sparse_xyz, feat, sparse_feat)
        assert out.shape == (2, 64, 8)
        # input channels = C2 (interp) + C2 (edge) + C1 (skip)
        k = v["params"]["mlp"]["layer0"]["dense"]["kernel"]
        assert k.shape[0] == 6 + 6 + 4

    def test_edge_fp_no_skip(self, rng):
        from regnet_for_3d_grasping_tpu.models.edge import (
            EdgeFeaturePropagation)
        xyz, _ = self._pc(rng)
        sparse_xyz = xyz[:, :16]
        sparse_feat = jnp.asarray(rng.rand(2, 16, 6).astype(np.float32))
        m = EdgeFeaturePropagation(mlp_channels=(8,))
        v = m.init(jax.random.PRNGKey(0), xyz, sparse_xyz, None,
                   sparse_feat)
        out = m.apply(v, xyz, sparse_xyz, None, sparse_feat)
        assert out.shape == (2, 64, 8)

    def test_edge_sa_gradients_flow(self, rng):
        from regnet_for_3d_grasping_tpu.models.edge import (
            EdgeSetAbstraction)
        xyz, feat = self._pc(rng)
        m = EdgeSetAbstraction(num_centroids=16, radius=0.3,
                               num_neighbours=8, mlp_channels=(8,))
        v = m.init(jax.random.PRNGKey(0), xyz, feat)

        def loss(params):
            _, nf = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xyz, feat)
            return jnp.sum(nf ** 2)

        g = jax.grad(loss)(v["params"])
        assert float(jnp.abs(
            g["mlp"]["layer0"]["dense"]["kernel"]).sum()) > 0


class TestBpdist:
    def test_bpdist_matches_bpdist2_self(self, rng):
        from regnet_for_3d_grasping_tpu.ops.distances import bpdist, bpdist2
        a = jnp.asarray(rng.randn(2, 17, 3).astype(np.float32))
        np.testing.assert_allclose(np.asarray(bpdist(a)),
                                   np.asarray(bpdist2(a, a)),
                                   rtol=1e-5, atol=1e-6)

    def test_bpdist_values(self):
        from regnet_for_3d_grasping_tpu.ops.distances import bpdist
        a = jnp.asarray([[[0.0, 0.0], [3.0, 4.0]]])
        d = np.asarray(bpdist(a))
        np.testing.assert_allclose(d, [[[0.0, 25.0], [25.0, 0.0]]],
                                   atol=1e-6)


class TestFrozenBN:
    """Per-module BN-stat freezing (reference nn/freezer.py:96-113)."""

    def _model(self):
        from flax import linen as nn

        from regnet_for_3d_grasping_tpu.nn.layers import ConvBN

        class TwoBlocks(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                a = ConvBN(4, name="block_a")(x, train=train)
                b = ConvBN(4, name="block_b")(x, train=train)
                return a + b

        return TwoBlocks()

    def test_matched_bn_uses_running_stats_and_stops_updating(self, rng):
        from regnet_for_3d_grasping_tpu.nn.freezer import apply_with_frozen_bn

        m = self._model()
        x = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 3 + 1)
        variables = m.init(jax.random.PRNGKey(0), x)

        out, mut = apply_with_frozen_bn(
            m, variables, x, train=True, mutable=["batch_stats"],
            bn_freeze_patterns=[r"block_a"])

        old = variables["batch_stats"]
        new = mut["batch_stats"]
        # frozen module's stats untouched, unmatched module's updated
        np.testing.assert_array_equal(
            np.asarray(new["block_a"]["bn"]["mean"]),
            np.asarray(old["block_a"]["bn"]["mean"]))
        assert not np.array_equal(
            np.asarray(new["block_b"]["bn"]["mean"]),
            np.asarray(old["block_b"]["bn"]["mean"]))

        # and the frozen block normalized with RUNNING stats: the mixed
        # output must differ from the all-train forward and from the
        # all-eval forward, but equal train-b + eval-a composition
        full_train, _ = m.apply(variables, x, train=True,
                                mutable=["batch_stats"])
        full_eval = m.apply(variables, x, train=False)
        assert not np.allclose(np.asarray(out), np.asarray(full_train))
        assert not np.allclose(np.asarray(out), np.asarray(full_eval))

    def test_no_patterns_is_identity(self, rng):
        from regnet_for_3d_grasping_tpu.nn.freezer import apply_with_frozen_bn

        m = self._model()
        x = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        got, _ = apply_with_frozen_bn(
            m, variables, x, train=True, mutable=["batch_stats"],
            bn_freeze_patterns=[])
        want, _ = m.apply(variables, x, train=True,
                          mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
