"""Pallas kernel tests: interpret-mode numerics vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmpc_refseg_tpu.ops.pallas_kernels import (_mutan_fused_fwd,
                                                _mutan_reference, mutan_fused)


@pytest.mark.parametrize("n,k,c", [(64, 24, 16), (128, 128, 128)])
def test_mutan_kernel_matches_reference(rng, n, k, c):
    nh = 5
    x = rng.standard_normal((2, n, k)).astype(np.float32)
    w = (0.1 * rng.standard_normal((k, nh * c))).astype(np.float32)
    b = (0.1 * rng.standard_normal((nh * c,))).astype(np.float32)
    lang = rng.standard_normal((2, nh * c)).astype(np.float32)

    ref = _mutan_reference(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           jnp.asarray(lang), nh)
    ker = _mutan_fused_fwd(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           jnp.asarray(lang), num_heads=nh, interpret=True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mutan_kernel_bf16_interpret(rng):
    nh, n, k, c = 5, 64, 40, 32
    x = rng.standard_normal((1, n, k)).astype(np.float32)
    w = (0.1 * rng.standard_normal((k, nh * c))).astype(np.float32)
    b = np.zeros((nh * c,), np.float32)
    lang = rng.standard_normal((1, nh * c)).astype(np.float32)
    ref = _mutan_reference(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           jnp.asarray(lang), nh)
    ker = _mutan_fused_fwd(jnp.asarray(x, jnp.bfloat16), jnp.asarray(w),
                           jnp.asarray(b),
                           jnp.asarray(lang, jnp.bfloat16),
                           num_heads=nh, interpret=True)
    assert ker.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ker, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.05)


def test_mutan_bf16_tanh_chain_parity(rng):
    """bf16-evaluated tanh chain (the 2x-VPU-rate head epilogue, round-4
    head-perf work) vs the exact f32 chain: the output is bf16 either way,
    so the extra error budget is ~1 bf16 ulp per tanh with an f32 head-sum
    accumulator."""
    from cmpc_refseg_tpu.ops.pallas_kernels import _bf16_tanh_enabled
    nh, n, k, c = 5, 64, 40, 32
    x = jnp.asarray(rng.standard_normal((2, n, k)), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((k, nh * c)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((nh * c,)), jnp.float32)
    lang = jnp.asarray(rng.standard_normal((2, nh * c)), jnp.bfloat16)
    exact = _mutan_fused_fwd(x, w, b, lang, num_heads=nh, interpret=True,
                             bf16_tanh=False)
    fast = _mutan_fused_fwd(x, w, b, lang, num_heads=nh, interpret=True,
                            bf16_tanh=True)
    np.testing.assert_allclose(np.asarray(fast, np.float32),
                               np.asarray(exact, np.float32),
                               rtol=0.05, atol=0.03)
    # default gate: OFF (measured anti-win on v5e — see
    # _bf16_tanh_enabled docstring); CMPC_MUTAN_TANH=bf16 opts in
    import os
    assert not _bf16_tanh_enabled(jnp.bfloat16)
    os.environ["CMPC_MUTAN_TANH"] = "bf16"
    try:
        assert _bf16_tanh_enabled(jnp.bfloat16)
        assert not _bf16_tanh_enabled(jnp.float32)
    finally:
        del os.environ["CMPC_MUTAN_TANH"]


def test_mutan_grad_flows(rng):
    nh, n, k, c = 5, 16, 8, 8
    x = jnp.asarray(rng.standard_normal((1, n, k)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((k, nh * c)), jnp.float32)
    b = jnp.zeros((nh * c,), jnp.float32)
    lang = jnp.asarray(rng.standard_normal((1, nh * c)), jnp.float32)

    coef = jnp.asarray(rng.standard_normal((1, n, c)), jnp.float32)

    def loss(w):
        return jnp.sum(coef * mutan_fused(x, w, b, lang, nh))

    g = jax.grad(loss)(w)
    # finite-difference check on one coordinate
    e = 1e-3
    dw = np.zeros_like(np.asarray(w)); dw[0, 0] = e
    num = (loss(w + dw) - loss(w - dw)) / (2 * e)
    np.testing.assert_allclose(float(g[0, 0]), float(num), rtol=2e-2)


class TestFusedConvLSTM:
    """convlstm_step_fused (interpret mode) must match the XLA step
    (cmpc.convlstm_step) — same gate matmuls, peepholes and whole-sample
    layer norms, computed via tiled kernels with (sum, sumsq) statistics."""

    def test_matches_xla_step(self, rng):
        from cmpc_refseg_tpu.config import get_config
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.ops.pallas_kernels import convlstm_step_fused
        cfg = get_config("CMPC_model", H=64, W=64, mlp_dim=32, rnn_size=16,
                         v_emb_dim=16, vocab_size=30, glove_dim=8,
                         num_steps=6, res4_blocks=2)
        p = cmpc.init_convlstm(jax.random.PRNGKey(0), cfg)
        B, H, W, C = 2, cfg.vf_h, cfg.vf_w, cfg.mlp_dim
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        c = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        want_c, want_h = cmpc.convlstm_step(p, x, c, h)
        got_c, got_h = convlstm_step_fused(p, x, c, h, interpret=True)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                                   rtol=2e-4, atol=2e-5)

    def test_three_step_scan_parity(self, rng):
        """Chained 3-step usage (the fusion stack's scan) stays close."""
        from cmpc_refseg_tpu.config import get_config
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.ops.pallas_kernels import convlstm_step_fused
        cfg = get_config("CMPC_model", H=64, W=64, mlp_dim=32, rnn_size=16,
                         v_emb_dim=16, vocab_size=30, glove_dim=8,
                         num_steps=6, res4_blocks=2)
        p = cmpc.init_convlstm(jax.random.PRNGKey(1), cfg)
        B, H, W, C = 2, cfg.vf_h, cfg.vf_w, cfg.mlp_dim
        xs = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
              for _ in range(3)]
        cw = hw = cf_ = hf = jnp.zeros((B, H, W, C), jnp.float32)
        for x in xs:
            cw, hw = cmpc.convlstm_step(p, x, cw, hw)
            cf_, hf = convlstm_step_fused(p, x, cf_, hf, interpret=True)
        np.testing.assert_allclose(np.asarray(hf), np.asarray(hw),
                                   rtol=1e-3, atol=1e-4)


class TestFusedGraphConv:
    """graph_conv_fused (interpret mode) must match cmpc._graph_conv."""

    def test_matches_xla_graph_conv(self, rng):
        from cmpc_refseg_tpu.config import get_config
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.ops.pallas_kernels import graph_conv_fused
        cfg = get_config("CMPC_model", mlp_dim=32, rnn_size=16, v_emb_dim=32,
                         vocab_size=30, glove_dim=8, num_steps=6,
                         res4_blocks=2, H=64, W=64)
        gp = cmpc.init_spa_graph(jax.random.PRNGKey(0), cfg)["gconv"][0]
        B, N, C, T = 2, 64, cfg.v_emb_dim, cfg.num_steps
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        wa = jnp.asarray(np.abs(rng.standard_normal((B, N, T))), jnp.float32)
        va = jnp.asarray(np.abs(rng.standard_normal((B, N, T))), jnp.float32)
        want = cmpc._graph_conv(gp, x, wa, va)
        got = graph_conv_fused(gp, x, wa, va, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_dispatch_grad_uses_xla_path(self, rng):
        """graph_conv_opt under grad must run the XLA reference (and produce
        finite gradients) regardless of platform."""
        from cmpc_refseg_tpu.config import get_config
        from cmpc_refseg_tpu.models import cmpc
        cfg = get_config("CMPC_model", mlp_dim=32, rnn_size=16, v_emb_dim=32,
                         vocab_size=30, glove_dim=8, num_steps=6,
                         res4_blocks=2, H=64, W=64)
        gp = cmpc.init_spa_graph(jax.random.PRNGKey(0), cfg)["gconv"][0]
        B, N, C, T = 2, 64, cfg.v_emb_dim, cfg.num_steps
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        wa = jnp.asarray(np.abs(rng.standard_normal((B, N, T))), jnp.float32)
        va = jnp.asarray(np.abs(rng.standard_normal((B, N, T))), jnp.float32)

        def loss(gp_):
            return jnp.sum(cmpc.graph_conv_opt(gp_, x, wa, va) ** 2)

        g = jax.grad(loss)(gp)
        tot = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(tot) and tot > 0


class TestFusedSESum:
    """se_sum_fused (interpret mode) must match the XLA SE-sum + row l2norm
    (the standard-layout gated-exchange epilogue)."""

    @pytest.mark.parametrize("k", [1, 2])
    def test_matches_xla(self, rng, k):
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.ops.pallas_kernels import se_sum_fused
        B, N, C = 2, 64, 32
        feat = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        others = [jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
                  for _ in range(k)]
        gates = [jnp.asarray(rng.random((B, C)), jnp.float32)
                 for _ in range(k)]
        ws = [jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32)
              for _ in range(k)]
        bs = [jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
              for _ in range(k)]
        want = cmpc._se_sum_xla(feat, others, gates, ws, bs)
        got = se_sum_fused(feat, others, gates, ws, bs, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_exchange_step_normed_matches_module(self, rng):
        """exchange_step_normed == l2norm(apply_exchange) for the standard
        layout (the path the fusion stack now takes)."""
        from cmpc_refseg_tpu.config import get_config
        from cmpc_refseg_tpu.models import cmpc
        cfg = get_config("CMPC_model", mlp_dim=32, rnn_size=16, v_emb_dim=32,
                         vocab_size=30, glove_dim=8, num_steps=6,
                         res4_blocks=2, H=64, W=64)
        pex = cmpc.init_exchange(jax.random.PRNGKey(0), cfg, 2)
        B, C = 2, cfg.mlp_dim
        feat = jnp.asarray(rng.standard_normal((B, 8, 8, C)), jnp.float32)
        others = [jnp.asarray(rng.standard_normal((B, 8, 8, C)), jnp.float32)
                  for _ in range(2)]
        lang = jnp.asarray(rng.standard_normal((B, 1, 1, cfg.rnn_size)),
                           jnp.float32)
        want = cmpc.l2_normalize(
            cmpc.apply_exchange(pex, cfg, feat, others, lang), -1)
        got = cmpc.exchange_step_normed(pex, cfg, feat, others, lang)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_grad_path(self, rng):
        from cmpc_refseg_tpu.models import cmpc
        B, N, C = 2, 16, 16
        feat = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        others = (jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32),)
        gates = (jnp.asarray(rng.random((B, C)), jnp.float32),)
        ws = (jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32),)
        bs = (jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32),)

        def loss(w0):
            return jnp.sum(cmpc.se_sum_opt(feat, others, gates, (w0,), bs))

        g = jax.grad(loss)(ws[0])
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestShardMapDispatch:
    """Fused-kernel dispatch over a data-parallel mesh (VERDICT round-2 #1):
    with a declared data_parallel_dispatch context and CMPC_FUSED=interpret,
    every fused surface runs its Pallas kernel under jax.shard_map over the
    'data' axis — the exact multi-chip TPU dispatch — and must match the
    XLA reference bit-for-bit-ish on the virtual CPU mesh."""

    @staticmethod
    def _mesh(n=4):
        from cmpc_refseg_tpu.parallel.mesh import make_mesh
        return make_mesh(n)

    def test_se_sum_opt_sharded(self, rng, monkeypatch):
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.parallel.mesh import data_parallel_dispatch
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        B, N, C, k = 4, 64, 32, 2
        feat = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        others = tuple(jnp.asarray(rng.standard_normal((B, N, C)),
                                   jnp.float32) for _ in range(k))
        gates = tuple(jnp.asarray(rng.random((B, C)), jnp.float32)
                      for _ in range(k))
        ws = tuple(jnp.asarray(rng.standard_normal((C, C)) * 0.1,
                               jnp.float32) for _ in range(k))
        bs = tuple(jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
                   for _ in range(k))
        want = cmpc._se_sum_xla(feat, others, gates, ws, bs)
        with data_parallel_dispatch(self._mesh()):
            got = cmpc.se_sum_opt(feat, others, gates, ws, bs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_graph_conv_opt_sharded(self, rng, monkeypatch):
        from cmpc_refseg_tpu.config import get_config
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.parallel.mesh import data_parallel_dispatch
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        cfg = get_config("CMPC_model", mlp_dim=32, rnn_size=16, v_emb_dim=32,
                         vocab_size=30, glove_dim=8, num_steps=6,
                         res4_blocks=2, H=64, W=64)
        gp = cmpc.init_spa_graph(jax.random.PRNGKey(0), cfg)["gconv"][0]
        B, N, C, T = 4, 64, cfg.v_emb_dim, cfg.num_steps
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        wa = jnp.asarray(np.abs(rng.standard_normal((B, N, T))), jnp.float32)
        va = jnp.asarray(np.abs(rng.standard_normal((B, N, T))), jnp.float32)
        want = cmpc._graph_conv(gp, x, wa, va)
        with data_parallel_dispatch(self._mesh()):
            got = cmpc.graph_conv_opt(gp, x, wa, va)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_convlstm_opt_sharded(self, rng, monkeypatch):
        from cmpc_refseg_tpu.config import get_config
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.parallel.mesh import data_parallel_dispatch
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        cfg = get_config("CMPC_model", mlp_dim=32, rnn_size=16, v_emb_dim=32,
                         vocab_size=30, glove_dim=8, num_steps=6,
                         res4_blocks=2, H=64, W=64)
        p = cmpc.init_convlstm(jax.random.PRNGKey(1), cfg)
        B, H, W, C = 4, cfg.vf_h, cfg.vf_w, cfg.mlp_dim
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        c0 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        h0 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        want_c, want_h = cmpc.convlstm_step(p, x, c0, h0)
        with data_parallel_dispatch(self._mesh()):
            got_c, got_h = cmpc.convlstm_step_opt(p, x, c0, h0)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                                   rtol=2e-4, atol=2e-5)

    def test_mutan_fused_sharded(self, rng, monkeypatch):
        from cmpc_refseg_tpu.parallel.mesh import data_parallel_dispatch
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        nh, B, n, k, c = 5, 4, 64, 24, 16
        x = jnp.asarray(rng.standard_normal((B, n, k)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((k, nh * c)), jnp.float32)
        b = jnp.asarray(0.1 * rng.standard_normal((nh * c,)), jnp.float32)
        lang = jnp.asarray(rng.standard_normal((B, nh * c)), jnp.float32)
        want = _mutan_reference(x, w, b, lang, nh)
        with data_parallel_dispatch(self._mesh()):
            got = mutan_fused(x, w, b, lang, nh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_sharded_dispatch_inside_jit(self, rng, monkeypatch):
        """The production shape: dispatch traced INSIDE jit with sharded
        inputs (evaluate_sharded's flow)."""
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.parallel.mesh import (data_parallel_dispatch,
                                                   data_sharding)
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        mesh = self._mesh()
        B, N, C = 8, 64, 32
        feat = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        other = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        gate = jnp.asarray(rng.random((B, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
        want = cmpc._se_sum_xla(feat, (other,), (gate,), (w,), (b,))

        @jax.jit
        def f(feat, other, gate, w, b):
            return cmpc.se_sum_opt(feat, (other,), (gate,), (w,), (b,))

        sh = data_sharding(mesh)
        feat_s = jax.device_put(feat, sh)
        other_s = jax.device_put(other, sh)
        with data_parallel_dispatch(mesh):
            got = f(feat_s, other_s, gate, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)


class TestFusedModePolicy:
    """Dispatch-policy unit tests (VERDICT round-2 weak #7: the kill switch
    needs a dedicated test on the dispatching branch)."""

    def test_off_overrides_interpret(self, monkeypatch):
        from cmpc_refseg_tpu.ops.fused_dispatch import fused_mode
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        monkeypatch.setenv("CMPC_DISABLE_FUSED", "1")
        assert fused_mode(8) is None

    def test_off_value(self, monkeypatch):
        from cmpc_refseg_tpu.ops.fused_dispatch import fused_mode
        monkeypatch.setenv("CMPC_FUSED", "off")
        assert fused_mode(8) is None

    def test_auto_is_off_on_cpu(self, monkeypatch):
        from cmpc_refseg_tpu.ops.fused_dispatch import fused_mode
        monkeypatch.delenv("CMPC_FUSED", raising=False)
        assert fused_mode(8) is None   # test platform is CPU

    def test_interpret_engages_anywhere(self, monkeypatch):
        from cmpc_refseg_tpu.ops.fused_dispatch import fused_mode
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        assert fused_mode(1) is True

    def test_kill_switch_forces_xla_path(self, rng, monkeypatch):
        """With the kill switch set, se_sum_opt must take the XLA branch
        even under an active mesh context + interpret request."""
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.parallel.mesh import (data_parallel_dispatch,
                                                   make_mesh)
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        monkeypatch.setenv("CMPC_DISABLE_FUSED", "1")
        B, N, C = 4, 16, 16
        feat = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        others = (jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32),)
        gates = (jnp.asarray(rng.random((B, C)), jnp.float32),)
        ws = (jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32),)
        bs = (jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32),)
        want = cmpc._se_sum_xla(feat, others, gates, ws, bs)
        with data_parallel_dispatch(make_mesh(4)):
            got = cmpc.se_sum_opt(feat, others, gates, ws, bs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)   # identical branch


class TestFusedSpaAffinity:
    """spa_affinity_fused (interpret mode) vs cmpc._spa_affinity_xla: the
    graph projection + word affinity + relation scale + both softmax
    normalizations (CMPC_model.py:380-399), incl. the flash-style column
    softmax statistics."""

    def _inputs(self, rng, B=2, N=64, C=32, A=24, T=6):
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        wg = jnp.asarray(0.2 * rng.standard_normal((C, A)), jnp.float32)
        bg = jnp.asarray(0.1 * rng.standard_normal((A,)), jnp.float32)
        wt = jnp.asarray(rng.standard_normal((B, T, A)), jnp.float32)
        rel = jnp.asarray(rng.random((B, 1, T)), jnp.float32)
        mask = np.zeros((B, 1, T), np.float32)
        mask[:, :, :4] = 1
        return x, wg, bg, wt, rel, jnp.asarray(mask)

    @pytest.mark.parametrize("l2n,masked", [(False, True), (False, False),
                                            (True, False)])
    def test_matches_xla(self, rng, l2n, masked):
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.ops.pallas_kernels import spa_affinity_fused
        x, wg, bg, wt, rel, mask = self._inputs(rng)
        want_w, want_v = cmpc._spa_affinity_xla(
            x, wg, bg, wt, rel, mask, scale=32 ** 0.5, l2n=l2n,
            masked_softmax=masked)
        got_w, got_v = spa_affinity_fused(
            x, wg, bg, wt, rel, mask, scale=32 ** 0.5, l2n=l2n,
            masked_softmax=masked, interpret=True)
        np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=2e-5, atol=2e-6)

    def test_multi_tile_stats(self, rng):
        """N large enough for several tiles: the flash-rescaled column
        statistics must equal the exact softmax over all rows."""
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.ops.pallas_kernels import spa_affinity_fused
        x, wg, bg, wt, rel, mask = self._inputs(rng, N=256)
        want_w, want_v = cmpc._spa_affinity_xla(
            x, wg, bg, wt, rel, mask, scale=32 ** 0.5, l2n=False,
            masked_softmax=True)
        got_w, got_v = spa_affinity_fused(
            x, wg, bg, wt, rel, mask, scale=32 ** 0.5, l2n=False,
            masked_softmax=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                                   rtol=2e-5, atol=2e-6)

    def test_dispatch_grad_uses_xla_path(self, rng):
        """spa_affinity_opt under grad runs the XLA reference and yields
        finite grads into every operand."""
        from cmpc_refseg_tpu.models import cmpc
        x, wg, bg, wt, rel, mask = self._inputs(rng, B=1, N=16)

        def loss(x, wg, bg, wt):
            w, v = cmpc.spa_affinity_opt(x, wg, bg, wt, rel, mask,
                                         32 ** 0.5, False, True)
            return jnp.sum(w * w) + jnp.sum(v)

        gx, gw, gb, gt_ = jax.grad(loss, argnums=(0, 1, 2, 3))(x, wg, bg, wt)
        for g in (gx, gw, gb, gt_):
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.sum(jnp.abs(g))) > 0

    def test_sharded_dispatch(self, rng, monkeypatch):
        from cmpc_refseg_tpu.models import cmpc
        from cmpc_refseg_tpu.parallel.mesh import (data_parallel_dispatch,
                                                   make_mesh)
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        x, wg, bg, wt, rel, mask = self._inputs(rng, B=4)
        want_w, want_v = cmpc._spa_affinity_xla(
            x, wg, bg, wt, rel, mask, scale=32 ** 0.5, l2n=False,
            masked_softmax=True)
        with data_parallel_dispatch(make_mesh(4)):
            got_w, got_v = cmpc.spa_affinity_opt(
                x, wg, bg, wt, rel, mask, 32 ** 0.5, False, True)
        np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=2e-5, atol=2e-6)


class TestFusedMutanBackward:
    """mutan_bwd_fused (interpret) vs jax.vjp of the XLA reference: the
    recompute-in-kernel backward must reproduce dx/dw/db/dlang."""

    def _case(self, rng, B=2, N=64, K=24, C=16, nh=5):
        x = jnp.asarray(rng.standard_normal((B, N, K)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((K, nh * C)), jnp.float32)
        b = jnp.asarray(0.1 * rng.standard_normal((nh * C,)), jnp.float32)
        lang = jnp.asarray(rng.standard_normal((B, nh * C)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        return x, w, b, lang, g, nh

    def _check(self, rng, res_dtype=jnp.float32, rtol=3e-5, atol=3e-5,
               **kw):
        from cmpc_refseg_tpu.ops.pallas_kernels import (
            _mutan_fwd_with_residual, mutan_bwd_fused)
        x, w, b, lang, g, nh = self._case(rng, **kw)
        ref_out, vjp = jax.vjp(
            lambda x_, w_, b_, l_: _mutan_reference(x_, w_, b_, l_, nh),
            x, w, b, lang)
        want = vjp(g)
        out, v_res = _mutan_fwd_with_residual(x, w, b, lang, num_heads=nh,
                                              interpret=True,
                                              res_dtype=res_dtype)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=3e-5, atol=3e-5)
        got = mutan_bwd_fused(x, w, b, lang, g, v_res, num_heads=nh,
                              interpret=True)
        for a, bb, name in zip(got, want, ("dx", "dw", "db", "dlang")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=rtol, atol=atol, err_msg=name)

    def test_matches_xla_vjp_exact_math(self, rng):
        """f32 residual: the backward math itself is exact vs the XLA vjp."""
        self._check(rng)

    def test_matches_xla_vjp_multi_tile(self, rng):
        """Several row tiles per sample: the per-sample dlang / global db
        accumulations must span the grid correctly."""
        self._check(rng, B=3, N=128)

    def test_bf16_residual_tolerance(self, rng):
        """bf16 residual (the production dtype): grads track the f32 vjp to
        bf16 quantization error — the documented precision trade for not
        materializing the f32 intermediate."""
        self._check(rng, res_dtype=jnp.bfloat16, rtol=0.05, atol=0.05)


class TestDispatchTable:
    """Round-4: `auto` applies the measured per-variant bs=1 winners
    (LATENCY.json A/B) and gates on PER-DEVICE batch under a data mesh
    (round-3 advisor low #4)."""

    def test_auto_small_batch_winner_engages(self):
        from cmpc_refseg_tpu.ops.fused_dispatch import _policy
        # v2 at bs=1: measured on 3.06 vs auto 3.98 -> table forces fused
        assert _policy("auto", "tpu", 1, 1, 4, "CMPCv2_model", None) is False

    def test_auto_small_batch_non_winner_stays_xla(self):
        from cmpc_refseg_tpu.ops.fused_dispatch import _policy
        # v4 at bs=1: auto (gated) measured faster -> XLA below the gate
        assert _policy("auto", "tpu", 1, 1, 4, "CMPCv4_model", None) is None
        # video path's internal b=1 spa-graph: fused costs ~11 clips/s
        assert _policy("auto", "tpu", 1, 1, 4,
                       "CMPC_video_mm_tgraph_allvec", None) is None
        assert _policy("auto", "tpu", 1, 1, 4, None, None) is None

    def test_gate_uses_per_device_batch(self):
        from cmpc_refseg_tpu.ops.fused_dispatch import _policy
        # global batch 8 over an 8-way data mesh = 1 row/device: below the
        # bs>=4 gate even though the global batch passes it
        assert _policy("auto", "tpu", 8, 8, 4, None, 8) is None
        # 32 over 8 devices = 4 rows/device: gate passes
        assert _policy("auto", "tpu", 8, 32, 4, None, 8) is False

    def test_on_overrides_gate(self):
        from cmpc_refseg_tpu.ops.fused_dispatch import _policy
        assert _policy("on", "tpu", 1, 1, 4, None, None) is False

    def test_variant_context_reaches_fused_mode(self, monkeypatch):
        from cmpc_refseg_tpu.ops import fused_dispatch as fd
        monkeypatch.delenv("CMPC_FUSED", raising=False)
        seen = {}
        orig = fd._policy

        def spy(env, platform, n_dev, batch, min_batch, variant, axis):
            seen["variant"] = variant
            return orig(env, platform, n_dev, batch, min_batch, variant,
                        axis)

        monkeypatch.setattr(fd, "_policy", spy)
        with fd.variant_dispatch("CMPCv2_model"):
            fd.fused_mode(1, min_batch=4, kernel="graph")
        assert seen["variant"] == "CMPCv2_model"
        fd.fused_mode(1, min_batch=4)
        assert seen["variant"] is None


class TestGroupedSpaGraph:
    """Level-packed spa-graph (VERDICT r3 #6): grouped kernels must equal G
    independent per-level calls, in the XLA fallback AND in interpret mode
    (the exact TPU dispatch), and gradients must flow."""

    def _inputs(self, rng, g_n=3, b=1, n=64, c=32, a=24, t=6):
        import jax.numpy as jnp
        x = jnp.asarray(rng.standard_normal((g_n * b, n, c)), jnp.float32)
        wgs = jnp.asarray(0.2 * rng.standard_normal((g_n, c, a)), jnp.float32)
        bgs = jnp.asarray(0.1 * rng.standard_normal((g_n, a)), jnp.float32)
        wt = jnp.asarray(rng.standard_normal((g_n * b, t, a)), jnp.float32)
        rel = jnp.asarray(rng.random((g_n * b, 1, t)), jnp.float32)
        mask = jnp.asarray((rng.random((g_n * b, 1, t)) > 0.3
                            ).astype(np.float32))
        # ensure at least one valid word per row
        mask = mask.at[:, :, 0].set(1.0)
        return x, wgs, bgs, wt, rel, mask

    def test_grouped_affinity_matches_per_level(self, rng, monkeypatch):
        from cmpc_refseg_tpu.models.cmpc import (_spa_affinity_xla,
                                                 spa_affinity_grouped)
        x, wgs, bgs, wt, rel, mask = self._inputs(rng)
        scale = 32.0 ** 0.5
        w_g, v_g = spa_affinity_grouped(x, wgs, bgs, wt, rel, mask,
                                        scale, False, True)
        for g in range(3):
            w_1, v_1 = _spa_affinity_xla(x[g:g + 1], wgs[g], bgs[g],
                                         wt[g:g + 1], rel[g:g + 1],
                                         mask[g:g + 1], scale=scale,
                                         l2n=False, masked_softmax=True)
            np.testing.assert_allclose(np.asarray(w_g[g:g + 1]),
                                       np.asarray(w_1), rtol=2e-5,
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(v_g[g:g + 1]),
                                       np.asarray(v_1), rtol=2e-5,
                                       atol=2e-5)
        # interpret mode exercises the packed kernel itself
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        w_k, v_k = spa_affinity_grouped(x, wgs, bgs, wt, rel, mask,
                                        scale, False, True)
        np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_g),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_g),
                                   rtol=2e-4, atol=2e-4)

    def test_grouped_graph_conv_matches_per_level(self, rng, monkeypatch):
        import jax.numpy as jnp
        from cmpc_refseg_tpu.models.cmpc import (_graph_conv,
                                                 graph_conv_grouped)
        g_n, b, n, c, t = 3, 1, 64, 32, 6
        x = jnp.asarray(rng.standard_normal((g_n * b, n, c)), jnp.float32)
        w_aff = jnp.asarray(rng.random((g_n * b, n, t)), jnp.float32)
        v_aff = jnp.asarray(rng.random((g_n * b, n, t)), jnp.float32)
        gps = []
        for g in range(g_n):
            gps.append({
                "update": {"DW": jnp.asarray(
                    0.2 * rng.standard_normal((1, 1, c, c)), jnp.float32),
                    "biases": jnp.asarray(0.1 * rng.standard_normal((c,)),
                                          jnp.float32)},
                "feat_ln": {"gamma": jnp.ones((c,)) + 0.1 * g,
                            "beta": jnp.zeros((c,)) + 0.05 * g},
                "update_ln": {"gamma": jnp.ones((c,)) - 0.1 * g,
                              "beta": jnp.zeros((c,)) - 0.02 * g},
            })
        got = graph_conv_grouped(tuple(gps), x, w_aff, v_aff)
        for g in range(g_n):
            want = _graph_conv(gps[g], x[g:g + 1], w_aff[g:g + 1],
                               v_aff[g:g + 1])
            np.testing.assert_allclose(np.asarray(got[g:g + 1]),
                                       np.asarray(want), rtol=2e-5,
                                       atol=2e-5)
        monkeypatch.setenv("CMPC_FUSED", "interpret")
        got_k = graph_conv_grouped(tuple(gps), x, w_aff, v_aff)
        np.testing.assert_allclose(np.asarray(got_k), np.asarray(got),
                                   rtol=5e-3, atol=5e-3)

    def test_grouped_affinity_grad_flows(self, rng):
        from cmpc_refseg_tpu.models.cmpc import spa_affinity_grouped
        x, wgs, bgs, wt, rel, mask = self._inputs(rng, n=16, c=8, a=8)

        def loss(wgs):
            w, v = spa_affinity_grouped(x, wgs, bgs, wt, rel, mask,
                                        8.0 ** 0.5, False, True)
            return jnp.sum(w * w) + jnp.sum(v)

        g = jax.grad(loss)(wgs)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


def test_lang2vis_multi_matches_per_level(rng):
    """apply_lang2vis_multi (level-packed spa-graph) must reproduce the
    per-level apply_lang2vis outputs exactly on the XLA path."""
    import jax
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.models import cmpc
    from cmpc_refseg_tpu.models.model import init_model
    from cmpc_refseg_tpu.models.language import encode_text

    cfg = get_config("CMPC_model", H=32, W=32, num_steps=6, vocab_size=30,
                     glove_dim=8, rnn_size=16, v_emb_dim=16, mlp_dim=12,
                     batch_size=2, res4_blocks=2)
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    b, hw = 2, cfg.vf_h
    words = np.zeros((b, cfg.num_steps), np.int32)
    words[:, :3] = [[3, 4, 5], [6, 7, 8]]
    text = encode_text(params["text"], cfg, words=jnp.asarray(words),
                       seq_len=jnp.asarray([3, 3], jnp.int32))
    words_parse = cmpc.apply_lang_parser(params["parser"], text.parse_feat,
                                         text.seq_mask)
    from cmpc_refseg_tpu.ops.spatial import spatial_coordinate_grid
    spatial = jnp.broadcast_to(spatial_coordinate_grid(hw, hw)[None],
                               (b, hw, hw, 8))
    visuals = [jnp.asarray(rng.standard_normal((b, hw, hw, cfg.v_emb_dim)),
                           jnp.float32) for _ in cfg.levels]
    plist = [params["levels"][lv] for lv in cfg.levels]

    multi_f, multi_gw = cmpc.apply_lang2vis_multi(
        plist, cfg, visuals, text.words_feat, words_parse, text.seq_mask,
        spatial)
    for i, lv in enumerate(cfg.levels):
        f1, gw1 = cmpc.apply_lang2vis(
            plist[i], cfg, visuals[i], text.words_feat, words_parse,
            text.seq_mask, spatial)
        np.testing.assert_allclose(np.asarray(multi_f[i]), np.asarray(f1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(multi_gw[i][0]),
                                   np.asarray(gw1[0]), rtol=1e-5,
                                   atol=1e-6)
