import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.ops import sampling, render, proposal


class TestStratified:
    def test_equidistant_bins(self):
        ts, te = sampling.sample_stratified(None, 4, 8, 2.0, 8.0, "equidistant")
        assert ts.shape == (4, 8) and te.shape == (4, 8)
        interval = 6.0 / 8
        np.testing.assert_allclose(np.asarray(ts[0]), 2.0 + interval * np.arange(8), atol=1e-6)
        # intervals chain: t_end[i] == t_start[i+1], last end == far
        np.testing.assert_allclose(np.asarray(te[:, :-1]), np.asarray(ts[:, 1:]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(te[:, -1]), 8.0, atol=1e-6)

    def test_stratified_within_bins(self):
        key = jax.random.PRNGKey(0)
        ts, te = sampling.sample_stratified(key, 128, 16, 2.0, 8.0, "stratified_uniform")
        interval = 6.0 / 16
        lo = 2.0 + interval * np.arange(16)
        t = np.asarray(ts)
        assert (t >= lo - 1e-6).all() and (t <= lo + interval + 1e-6).all()

    def test_negative_offset(self):
        # run_barf.py uses equidistant with offset_size=-1: shared shift in (-interval, 0]
        key = jax.random.PRNGKey(1)
        ts, _ = sampling.sample_stratified(key, 64, 16, 2.0, 8.0, "equidistant", offset_size=-1.0)
        interval = 6.0 / 16
        base = 2.0 + interval * np.arange(16)
        shift = np.asarray(ts) - base
        # shared per-ray shift
        np.testing.assert_allclose(shift, np.broadcast_to(shift[:, :1], shift.shape), atol=1e-5)
        assert (shift <= 1e-6).all() and (shift >= -interval - 1e-6).all()


class TestSamplePDF:
    def test_concentrates_mass(self):
        edges = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
        w = jnp.zeros((4, 8)).at[:, 3].set(1.0)
        t = sampling.sample_pdf(edges, w, 64)
        t = np.asarray(t)
        inside = ((t >= 3 / 8 - 1e-3) & (t <= 4 / 8 + 1e-3)).mean()
        assert inside > 0.95

    def test_uniform_weights_uniform_samples(self):
        edges = jnp.broadcast_to(jnp.linspace(2.0, 8.0, 17), (2, 17))
        w = jnp.ones((2, 16))
        t = sampling.sample_pdf(edges, w, 128)
        # deterministic quantiles: evenly spaced
        expected = 2.0 + 6.0 * (np.arange(128) + 0.5) / 128
        np.testing.assert_allclose(np.asarray(t[0]), expected, atol=1e-4)

    def test_intervals_output(self):
        tcs, tce = sampling.sample_stratified(None, 3, 8, 2.0, 8.0, "equidistant")
        w = jnp.ones((3, 8))
        ts, te = sampling.sample_pdf_weighted_intervals(tcs, tce, w, 32, 8.0)
        assert ts.shape == (3, 32)
        assert (np.asarray(te) >= np.asarray(ts) - 1e-6).all()

    def test_lindisp_edges(self):
        e = sampling.lindisp_edges(2, 8, 2.0, 8.0, stratified=False)
        assert e.shape == (2, 9)
        np.testing.assert_allclose(float(e[0, 0]), 2.0, atol=1e-5)
        np.testing.assert_allclose(float(e[0, -1]), 8.0, atol=1e-4)
        # uniform in disparity
        disp = 1.0 / np.asarray(e[0])
        np.testing.assert_allclose(np.diff(disp), np.diff(disp)[0], atol=1e-6)


class TestRender:
    def test_opaque_wall(self):
        # A very dense first sample should dominate the color
        d = jnp.zeros((2, 8)).at[:, 0].set(1e4)
        c = jnp.zeros((2, 8, 3)).at[:, 0, :].set(jnp.array([1.0, 0.5, 0.25]))
        dist = jnp.full((2, 8), 0.1)
        rgb, w = render.render_rays(d, c, dist)
        np.testing.assert_allclose(np.asarray(rgb[0]), [1.0, 0.5, 0.25], atol=1e-5)
        np.testing.assert_allclose(float(w[0, 0]), 1.0, atol=1e-5)

    def test_empty_space(self):
        rgb, w = render.render_rays(jnp.zeros((2, 8)), jnp.ones((2, 8, 3)), jnp.full((2, 8), 0.1))
        np.testing.assert_allclose(np.asarray(rgb), 0.0, atol=1e-6)

    def test_weights_sum_to_one_minus_transmittance(self):
        key = jax.random.PRNGKey(2)
        d = jax.random.uniform(key, (4, 16)) * 5
        dist = jnp.full((4, 16), 0.2)
        w, alpha, trans = render.render_weights(d, dist)
        total = np.asarray(jnp.sum(w, axis=-1))
        final_trans = np.asarray(jnp.exp(jnp.sum(-d * dist, axis=-1)))
        np.testing.assert_allclose(total, 1.0 - final_trans, atol=1e-5)

    def test_analytic_homogeneous_medium(self):
        # constant sigma: expected rgb = (1 - exp(-sigma*L)) * c
        sigma = 2.0
        n = 256
        ts, te = sampling.sample_stratified(None, 1, n, 0.0, 1.0, "equidistant")
        d = jnp.full((1, n), sigma)
        c = jnp.ones((1, n, 3))
        rgb, _ = render.render_rays(d, c, te - ts)
        expected = 1.0 - np.exp(-sigma * 1.0)
        np.testing.assert_allclose(np.asarray(rgb[0]), expected, atol=2e-2)

    def test_render_full_depth_opacity(self):
        d = jnp.zeros((1, 8)).at[0, 4].set(1e4)
        c = jnp.ones((1, 8, 3))
        ts, te = sampling.sample_stratified(None, 1, 8, 2.0, 8.0, "equidistant")
        rgb, opacity, depth, extras = render.render_full(d, c, ts, te)
        np.testing.assert_allclose(float(opacity[0, 0]), 1.0, atol=1e-5)
        t_mid = float((ts[0, 4] + te[0, 4]) / 2)
        np.testing.assert_allclose(float(depth[0, 0]), t_mid, atol=1e-4)
        assert extras["trans"].shape == (1, 8)


class TestProposal:
    def _gauss_sigma_fn(self, center=4.0, width=0.3, scale=20.0):
        def fn(ts, te):
            tm = (ts + te) / 2
            return scale * jnp.exp(-((tm - center) ** 2) / (2 * width**2))

        return fn

    def test_sampling_concentrates_near_density(self):
        fn = self._gauss_sigma_fn()
        ts, te, aux = proposal.sampling(
            [fn], [64], 128, n_rays=8, near_plane=2.0, far_plane=8.0,
            sampling_type="lindisp", stratified=False,
        )
        assert ts.shape == (8, 128)
        tm = np.asarray((ts + te) / 2)
        frac_near = ((tm > 3.0) & (tm < 5.0)).mean()
        assert frac_near > 0.7

    def test_sampling_stratified_reproducible(self):
        fn = self._gauss_sigma_fn()
        key = jax.random.PRNGKey(0)
        out1 = proposal.sampling([fn], [32], 64, 4, 2.0, 8.0, stratified=True, key=key)
        out2 = proposal.sampling([fn], [32], 64, 4, 2.0, 8.0, stratified=True, key=key)
        np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]))

    def test_loss_zero_when_proposal_covers(self):
        # If proposal weights >= outer mass of final weights, the loss is 0.
        n, b = 4, 16
        s_edges = jnp.broadcast_to(jnp.linspace(0, 1, b + 1), (n, b + 1))
        w_prop = jnp.ones((n, b))  # plenty of mass everywhere
        final_edges = s_edges
        final_w = jnp.full((n, b), 1.0 / b)
        aux = proposal.ProposalAux((s_edges,), (w_prop,), final_edges)
        loss = float(proposal.compute_loss(aux, final_w))
        assert loss < 1e-8

    def test_loss_positive_when_proposal_misses(self):
        n, b = 4, 16
        s_edges = jnp.broadcast_to(jnp.linspace(0, 1, b + 1), (n, b + 1))
        w_prop = jnp.zeros((n, b))  # proposal puts no mass anywhere
        final_w = jnp.zeros((n, b)).at[:, 8].set(1.0)
        aux = proposal.ProposalAux((s_edges,), (w_prop,), s_edges)
        loss = float(proposal.compute_loss(aux, final_w))
        assert loss > 0.1

    def test_loss_differentiable_wrt_proposal_weights(self):
        n, b = 2, 8
        s_edges = jnp.broadcast_to(jnp.linspace(0, 1, b + 1), (n, b + 1))
        final_w = jnp.zeros((n, b)).at[:, 4].set(1.0)

        def loss_fn(w_prop):
            aux = proposal.ProposalAux((s_edges,), (w_prop,), s_edges)
            return proposal.compute_loss(aux, final_w)

        g = jax.grad(loss_fn)(jnp.full((n, b), 0.1))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestMonotonicity:
    def test_sample_pdf_outputs_sorted_without_sort(self):
        # inverse-CDF with monotone quantiles must be monotone (no sort in path)
        key = jax.random.PRNGKey(9)
        edges = jnp.sort(jax.random.uniform(key, (16, 33)) * 6 + 2, axis=-1)
        w = jax.random.uniform(jax.random.PRNGKey(10), (16, 32)) + 0.01
        for k in [None, jax.random.PRNGKey(11)]:
            t = np.asarray(sampling.sample_pdf(edges, w, 64, key=k))
            assert (np.diff(t, axis=-1) >= -1e-6).all()

    def test_searchsorted_rows_matches_numpy(self):
        key = jax.random.PRNGKey(12)
        arr = jnp.sort(jax.random.uniform(key, (8, 20)), axis=-1)
        q = jax.random.uniform(jax.random.PRNGKey(13), (8, 15))
        for side in ("left", "right"):
            got = np.asarray(sampling.searchsorted_rows(arr, q, side=side))
            ref = np.stack([np.searchsorted(np.asarray(arr[i]), np.asarray(q[i]), side=side)
                            for i in range(8)])
            np.testing.assert_array_equal(got, ref)
