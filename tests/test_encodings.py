"""Tests for encodings: NeRF frequency, SH, multi-res hash grid."""

import jax
import jax.numpy as jnp
import numpy as np

from neusky_tpu.ops.encodings import nerf_encoding, nerf_encoding_dim, sh_encoding
from neusky_tpu.ops.hashgrid import HashGridConfig, HashGridEncoding


def test_nerf_encoding_shapes_and_values():
    x = jnp.array([[0.25, 0.5, -0.5]])
    enc = nerf_encoding(x, num_frequencies=6, min_freq_exp=0.0, max_freq_exp=5.0)
    assert enc.shape == (1, nerf_encoding_dim(3, 6))
    enc_i = nerf_encoding(x, 4, 0.0, 3.0, include_input=True)
    assert enc_i.shape == (1, nerf_encoding_dim(3, 4, include_input=True))
    assert np.allclose(enc_i[0, -3:], x[0])
    # freq 2^0: sin(2*pi*x), cos(2*pi*x)
    assert np.allclose(enc[0, 0], np.sin(2 * np.pi * 0.25), atol=1e-5)


def test_sh_encoding():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    sh = sh_encoding(d, levels=4)
    assert sh.shape == (2, 16)
    assert np.allclose(sh[:, 0], 0.28209479, atol=1e-6)
    # l=1 band for +z: only the z component non-zero
    assert np.allclose(sh[0, 1], 0.0, atol=1e-6)
    assert np.allclose(sh[0, 2], 0.48860251, atol=1e-6)


class TestHashGrid:
    def _enc(self, **kw):
        cfg = HashGridConfig(
            num_levels=4, features_per_level=2, log2_hashmap_size=12,
            base_res=4, max_res=32, **kw,
        )
        return HashGridEncoding(cfg)

    def test_shapes(self):
        enc = self._enc()
        table = enc.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
        out = enc(table, x)
        assert out.shape == (128, enc.out_dim)

    def test_interpolation_exact_at_vertices(self):
        """At a grid vertex the encoding equals the table entry (dense level)."""
        enc = self._enc()
        table = enc.init(jax.random.PRNGKey(0))
        # level 0 is dense with res 4; position exactly at vertex (1,2,3)/4
        x = jnp.array([[1.0 / 4, 2.0 / 4, 3.0 / 4]])
        out = enc(table, x)
        # dense index at level 0: 1 + 2*5 + 3*25 = 86 ([L, F, T] storage)
        expected = table[0, :, 86]
        assert np.allclose(out[0, :2], expected, atol=1e-6)

    def test_continuity(self):
        enc = self._enc()
        table = enc.init(jax.random.PRNGKey(0)) * 1e4  # amplify
        x = jnp.array([[0.3, 0.4, 0.5]])
        eps = 1e-5
        o1 = enc(table, x)
        o2 = enc(table, x + eps)
        assert np.allclose(o1, o2, atol=1e-2)

    def test_grad_wrt_table_and_position(self):
        enc = self._enc()
        table = enc.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=0.1, maxval=0.9)

        def loss_t(t):
            return jnp.sum(enc(t, x) ** 2)

        g = jax.grad(loss_t)(table)
        assert g.shape == table.shape
        assert np.isfinite(np.array(g)).all()

        def loss_x(xx):
            return jnp.sum(enc(table, xx))

        gx = jax.grad(loss_x)(x)
        assert gx.shape == x.shape
        assert np.isfinite(np.array(gx)).all()

    def test_second_order_grad(self):
        """grad-of-grad through the encoding (eikonal-loss structure)."""
        enc = self._enc(smoothstep=True)
        table = enc.init(jax.random.PRNGKey(0))
        x = jnp.array([[0.3, 0.45, 0.6]])

        def f(xx):
            return jnp.sum(enc(table, xx))

        def grad_norm(xx):
            g = jax.grad(f)(xx)
            return jnp.sum(g**2)

        gg = jax.grad(grad_norm)(x)  # d/dx |∇f|² — needs 2nd-order AD
        assert np.isfinite(np.array(gg)).all()
        # also differentiable wrt table through the gradient
        def table_loss(t):
            g = jax.grad(lambda xx: jnp.sum(enc(t, xx)))(x)
            return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

        gt = jax.grad(table_loss)(table)
        assert np.isfinite(np.array(gt)).all()

    def test_encode_with_dx_matches_ad(self):
        """Analytic encode derivative == autodiff jacobian (both interps)."""
        for smooth in (False, True):
            enc = self._enc(smoothstep=smooth)
            table = enc.init(jax.random.PRNGKey(0)) * 1e4
            x = jax.random.uniform(
                jax.random.PRNGKey(5), (8, 3), minval=0.05, maxval=0.95
            )
            out, dout = enc.encode_with_dx(table, x, custom_take=False)
            out_ref = enc(table, x)
            assert np.allclose(np.asarray(out), np.asarray(out_ref), atol=1e-4)
            jac = jax.vmap(jax.jacfwd(lambda p: enc(table, p[None])[0]))(x)
            # jac: [N, L*F, 3]; dout: [N, 3, L*F]
            assert np.allclose(
                np.asarray(dout), np.asarray(jac).transpose(0, 2, 1), atol=1e-2
            ), f"smoothstep={smooth}"

    def test_custom_vjp_table_grad_matches_xla(self):
        """_level_encode(_dx) recompute-residual backward == plain AD."""
        for smooth in (False, True):
            enc = self._enc(smoothstep=smooth)
            table = enc.init(jax.random.PRNGKey(0)) * 1e4
            x = jax.random.uniform(
                jax.random.PRNGKey(7), (16, 3), minval=0.05, maxval=0.95
            )

            def loss_plain(t):
                return jnp.sum(enc(t, x, custom_take=False) ** 2)

            def loss_custom(t):
                return jnp.sum(enc(t, x, custom_take=True) ** 2)

            gp = jax.grad(loss_plain)(table)
            gc = jax.grad(loss_custom)(table)
            assert np.allclose(np.asarray(gp), np.asarray(gc), atol=1e-3)

            def dx_loss(t, custom):
                out, dout = enc.encode_with_dx(t, x, custom_take=custom)
                return jnp.sum(out**2) + jnp.sum(dout**2)

            gp2 = jax.grad(lambda t: dx_loss(t, False))(table)
            gc2 = jax.grad(lambda t: dx_loss(t, True))(table)
            assert np.allclose(np.asarray(gp2), np.asarray(gc2), atol=1e-2), (
                np.abs(np.asarray(gp2) - np.asarray(gc2)).max()
            )

            # POSITION gradients through the custom path must match plain AD
            # (the sdf-at-termination-points site trains the DDF through
            # them — a zero x-cotangent here is a silent correctness bug)
            def xloss(xx, custom):
                return jnp.sum(enc(table, xx, custom_take=custom) ** 2)

            gxp = jax.grad(lambda xx: xloss(xx, False))(x)
            gxc = jax.grad(lambda xx: xloss(xx, True))(x)
            assert np.allclose(np.asarray(gxp), np.asarray(gxc), atol=1e-2), (
                np.abs(np.asarray(gxp) - np.asarray(gxc)).max()
            )

    def test_finite_diff_position_grad(self):
        enc = self._enc(smoothstep=True)
        table = enc.init(jax.random.PRNGKey(0)) * 1e4
        x = jnp.array([[0.33, 0.44, 0.55]])

        def f(xx):
            return jnp.sum(enc(table, xx))

        g = jax.grad(f)(x)
        eps = 1e-4
        for d in range(3):
            dx = jnp.zeros_like(x).at[0, d].add(eps)
            fd = (f(x + dx) - f(x - dx)) / (2 * eps)
            assert np.allclose(g[0, d], fd, rtol=5e-2, atol=1e-3)


class TestStochasticTableGrads:
    """Stochastic-corner table gradients (``_level_encode_stoch`` /
    ``_level_encode_dx_stoch``): exact forward, exact position cotangent,
    unbiased 1-corner table gradient."""

    def _enc(self):
        cfg = HashGridConfig(
            num_levels=3, features_per_level=2, log2_hashmap_size=10,
            base_res=4, max_res=16,
        )
        enc = HashGridEncoding(cfg)
        table = enc.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        return enc, table, x

    def test_forward_exact(self):
        enc, table, x = self._enc()
        exact = enc(table, x, custom_take=True)
        salt = jnp.uint32(1234)
        stoch = enc(table, x, custom_take=True, stoch_salt=salt)
        np.testing.assert_allclose(np.asarray(stoch), np.asarray(exact), rtol=1e-6)

    def test_encode_with_dx_forward_exact(self):
        enc, table, x = self._enc()
        out_e, dx_e = enc.encode_with_dx(table, x)
        out_s, dx_s = enc.encode_with_dx(table, x, stoch_salt=jnp.uint32(7))
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_e), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_e), rtol=1e-6)

    def test_position_cotangent_exact(self):
        """By default the encode's position cotangent is NOT sampled — the
        DDF level-set loss differentiates through termination points.
        (``stoch_dxt=True`` opts into a sampled cotangent; see
        ``TestStochasticDxt``.)"""
        enc, table, x = self._enc()

        def f_exact(x):
            return jnp.sum(jnp.sin(enc(table, x, custom_take=True)))

        def f_stoch(x):
            return jnp.sum(
                jnp.sin(enc(table, x, custom_take=True, stoch_salt=jnp.uint32(3)))
            )

        gx_e = jax.grad(f_exact)(x)
        gx_s = jax.grad(f_stoch)(x)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_e), rtol=1e-5, atol=1e-6)

    def test_table_grad_unbiased(self):
        enc, table, x = self._enc()

        def loss(tbl, salt):
            return jnp.sum(enc(tbl, x, custom_take=True, stoch_salt=salt) ** 2)

        def loss_exact(tbl):
            return jnp.sum(enc(tbl, x, custom_take=True) ** 2)

        g_exact = jax.grad(loss_exact)(table)
        g_fn = jax.jit(jax.grad(loss))
        acc = jnp.zeros_like(g_exact)
        n = 600
        for s in range(n):
            acc = acc + g_fn(table, jnp.uint32(s * 2654435761 % (2**32)))
        mean = np.asarray(acc / n)
        ref = np.asarray(g_exact)
        denom = np.abs(ref).max()
        assert np.abs(mean - ref).max() / denom < 0.12, (
            np.abs(mean - ref).max() / denom
        )

    def test_dx_table_grad_unbiased(self):
        enc, table, x = self._enc()

        def loss(tbl, salt):
            out, dx = enc.encode_with_dx(tbl, x, stoch_salt=salt)
            return jnp.sum(out ** 2) + jnp.sum(dx ** 2) * 1e-3

        def loss_exact(tbl):
            out, dx = enc.encode_with_dx(tbl, x)
            return jnp.sum(out ** 2) + jnp.sum(dx ** 2) * 1e-3

        g_exact = jax.grad(loss_exact)(table)
        salts = jnp.asarray(
            (np.arange(2400, dtype=np.uint64) * 40503 + 17) % (2**32),
            jnp.uint32,
        )
        g_all = jax.jit(jax.vmap(jax.grad(loss), in_axes=(None, 0)))(table, salts)
        ref = np.asarray(g_exact)
        denom = np.abs(ref).max()
        err_half = np.abs(np.asarray(jnp.mean(g_all[:1200], 0)) - ref).max() / denom
        err_full = np.abs(np.asarray(jnp.mean(g_all, 0)) - ref).max() / denom
        # mean converges to the exact gradient (unbiased): error small and
        # shrinking with more salts
        assert err_full < 0.2, (err_half, err_full)
        assert err_full < err_half * 1.05, (err_half, err_full)


class TestStochasticDxt:
    """``stoch_dxt=True`` (``_level_encode_stoch_sdxt``): exact forward,
    table gradient bit-identical to the ``stoch_salt`` path (same corner
    draw), and an UNBIASED 1-corner position cotangent replacing the exact
    8-corner backward re-gather."""

    def _enc(self):
        cfg = HashGridConfig(
            num_levels=3, features_per_level=2, log2_hashmap_size=10,
            base_res=4, max_res=16,
        )
        enc = HashGridEncoding(cfg)
        table = enc.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        return enc, table, x

    def test_forward_exact(self):
        enc, table, x = self._enc()
        exact = enc(table, x, custom_take=True)
        out = enc(
            table, x, custom_take=True, stoch_salt=jnp.uint32(99), stoch_dxt=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(exact), rtol=1e-6)

    def test_table_grad_bitmatched(self):
        """Same salt ⇒ the table cotangent is IDENTICAL to the plain
        stoch_salt path (the dxt sampling must not perturb the table draw)."""
        enc, table, x = self._enc()
        salt = jnp.uint32(4242)

        def loss(tbl, dxt):
            return jnp.sum(
                enc(tbl, x, custom_take=True, stoch_salt=salt, stoch_dxt=dxt) ** 2
            )

        g_plain = jax.grad(lambda t: loss(t, False))(table)
        g_sdxt = jax.grad(lambda t: loss(t, True))(table)
        np.testing.assert_array_equal(np.asarray(g_plain), np.asarray(g_sdxt))

    def test_position_cotangent_unbiased(self):
        enc, table, x = self._enc()

        def gx(salt, dxt):
            def f(xx):
                return jnp.sum(
                    jnp.sin(
                        enc(
                            table, xx, custom_take=True,
                            stoch_salt=salt, stoch_dxt=dxt,
                        )
                    )
                )

            return jax.grad(f)(x)

        g_exact = gx(jnp.uint32(0), False)
        salts = jnp.asarray(
            (np.arange(2400, dtype=np.uint64) * 2654435761 + 13) % (2**32),
            jnp.uint32,
        )
        g_all = jax.jit(jax.vmap(lambda s: gx(s, True)))(salts)
        ref = np.asarray(g_exact)
        denom = np.abs(ref).max()
        err_half = np.abs(np.asarray(jnp.mean(g_all[:1200], 0)) - ref).max() / denom
        err_full = np.abs(np.asarray(jnp.mean(g_all, 0)) - ref).max() / denom
        # unbiased: error small and shrinking as more salts are averaged
        assert err_full < 0.2, (err_half, err_full)
        assert err_full < err_half * 1.05, (err_half, err_full)

    def test_field_config_threads_flag(self):
        """SDFAlbedoFieldConfig.stochastic_dxt reaches the encode: sdf_only's
        forward value is unchanged and its position gradient becomes the
        sampled estimator (different from exact for a single salt)."""
        from neusky_tpu.fields.sdf_albedo import SDFAlbedoField, SDFAlbedoFieldConfig

        base = dict(
            num_layers=1, hidden_dim=16, geo_feat_dim=8, num_layers_color=1,
            hidden_dim_color=16,
            hash=HashGridConfig(
                num_levels=3, features_per_level=2, log2_hashmap_size=10,
                base_res=4, max_res=16,
            ),
        )
        f_exact = SDFAlbedoField(SDFAlbedoFieldConfig(**base))
        f_sdxt = SDFAlbedoField(SDFAlbedoFieldConfig(stochastic_dxt=True, **base))
        x = jax.random.uniform(jax.random.PRNGKey(2), (32, 3)) * 2.0 - 1.0
        params = f_exact.init(jax.random.PRNGKey(0), x)
        # the geometric init ZEROES the geo-MLP weights on the hash-feature
        # columns, making the encode's output cotangent (and thus any
        # exact/sampled dxt difference) vanish at init — perturb away from it
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef,
            [
                l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                if jnp.issubdtype(l.dtype, jnp.floating)
                else l
                for l, k in zip(leaves, keys)
            ],
        )
        salt = jnp.uint32(77)

        sdf_e = f_exact.apply(params, x, salt, method=f_exact.sdf_only)
        sdf_s = f_sdxt.apply(params, x, salt, method=f_sdxt.sdf_only)
        np.testing.assert_allclose(
            np.asarray(sdf_s), np.asarray(sdf_e), rtol=1e-6, atol=1e-7
        )

        def gpos(field):
            def f(xx):
                return jnp.sum(field.apply(params, xx, salt, method=field.sdf_only))

            return jax.grad(f)(x)

        g_e = np.asarray(gpos(f_exact))
        g_s = np.asarray(gpos(f_sdxt))
        assert not np.allclose(g_s, g_e), "flag did not reach the encode"


class TestVectorizedLevels:
    """The all-levels-in-one encode (``HashGridConfig.vectorized``) must
    match the per-level ops exactly — values, cotangents, and (same salt/u)
    the stochastic corner draws."""

    def _pair(self, **kw):
        base = dict(
            num_levels=6, features_per_level=2, log2_hashmap_size=12,
            base_res=4, max_res=128,  # spans dense AND hashed levels
        )
        base.update(kw)
        vec = HashGridEncoding(HashGridConfig(vectorized=True, **base))
        ref = HashGridEncoding(HashGridConfig(vectorized=False, **base))
        table = vec.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        return vec, ref, table, x

    def test_forward_parity_all_variants(self):
        vec, ref, table, x = self._pair()
        salt = jnp.uint32(99)
        u = jax.random.uniform(jax.random.PRNGKey(2), (x.shape[0],))
        for kw in (
            dict(),
            dict(custom_take=True),
            dict(custom_take=True, stoch_salt=salt),
            dict(stoch_u=u),
            dict(stoch_u=u, stoch_fwd=True),
        ):
            a = np.asarray(vec(table, x, **kw))
            b = np.asarray(ref(table, x, **kw))
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7, err_msg=str(kw))

    def test_forward_parity_smoothstep(self):
        vec, ref, table, x = self._pair(smoothstep=True)
        np.testing.assert_allclose(
            np.asarray(vec(table, x, custom_take=True)),
            np.asarray(ref(table, x, custom_take=True)),
            rtol=1e-6, atol=1e-7,
        )

    def test_encode_with_dx_parity(self):
        vec, ref, table, x = self._pair()
        for salt in (None, jnp.uint32(5)):
            ov, dv = vec.encode_with_dx(table, x, stoch_salt=salt)
            orf, drf = ref.encode_with_dx(table, x, stoch_salt=salt)
            np.testing.assert_allclose(np.asarray(ov), np.asarray(orf), rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(dv), np.asarray(drf), rtol=1e-5, atol=1e-5)

    def test_backward_parity_exact(self):
        """8-corner table gradient + position cotangent, vec vs per-level."""
        vec, ref, table, x = self._pair()

        def loss(enc_obj):
            def f(t, p):
                return jnp.sum(jnp.sin(enc_obj(t, p, custom_take=True)))
            return jax.grad(f, argnums=(0, 1))(table, x)

        gt_v, gx_v = loss(vec)
        gt_r, gx_r = loss(ref)
        np.testing.assert_allclose(np.asarray(gt_v), np.asarray(gt_r), rtol=1e-5, atol=3e-6)
        np.testing.assert_allclose(np.asarray(gx_v), np.asarray(gx_r), rtol=1e-5, atol=1e-7)

    def test_backward_parity_stoch_salt_bitmatched(self):
        """Same salt ⇒ the SAME sampled corners ⇒ identical stochastic
        table gradients (the vectorized hash replicates ``_cheap_hash_u``
        per level bit-for-bit)."""
        vec, ref, table, x = self._pair()
        salt = jnp.uint32(1234)

        def g(enc_obj):
            def f(t):
                return jnp.sum(jnp.sin(enc_obj(t, x, custom_take=True, stoch_salt=salt)))
            return jax.grad(f)(table)

        np.testing.assert_allclose(
            np.asarray(g(vec)), np.asarray(g(ref)), rtol=1e-5, atol=3e-6
        )

    def test_backward_parity_dx_stoch_bitmatched(self):
        vec, ref, table, x = self._pair()
        salt = jnp.uint32(77)

        def g(enc_obj):
            def f(t):
                o, d = enc_obj.encode_with_dx(table=t, x=x, stoch_salt=salt)
                return jnp.sum(jnp.sin(o)) + jnp.sum(jnp.cos(d))
            return jax.grad(f)(table)

        np.testing.assert_allclose(
            np.asarray(g(vec)), np.asarray(g(ref)), rtol=1e-5, atol=3e-6
        )

    def test_backward_parity_stoch_u_bitmatched(self):
        """Caller-uniform variants (proposal paths), same u ⇒ same draws."""
        vec, ref, table, x = self._pair()
        u = jax.random.uniform(jax.random.PRNGKey(3), (x.shape[0],))
        for fp in (False, True):
            def g(enc_obj):
                def f(t):
                    return jnp.sum(
                        jnp.sin(enc_obj(t, x, stoch_u=u, stoch_fwd=fp))
                    )
                return jax.grad(f)(table)

            np.testing.assert_allclose(
                np.asarray(g(vec)), np.asarray(g(ref)), rtol=1e-5, atol=3e-6,
                err_msg=f"fp={fp}",
            )


class TestBF16Gather:
    """``HashGridConfig.bf16_gather`` (NEUSKY_BF16_TABLES): corner gathers
    route through a bf16 cast of the level table.  Outputs/cotangents must
    stay f32 and match the fp32 gather within bf16 rounding (~2^-8 rel)."""

    def _pair(self):
        base = dict(
            num_levels=4, features_per_level=2, log2_hashmap_size=12,
            base_res=4, max_res=32,
        )
        bf = HashGridEncoding(HashGridConfig(bf16_gather=True, **base))
        ref = HashGridEncoding(HashGridConfig(**base))
        table = ref.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(
            jax.random.PRNGKey(1), (64, 3), minval=0.05, maxval=0.95
        )
        return bf, ref, table, x

    def _close(self, a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.02 * scale, rtol=0.02)

    def test_forward_close_and_f32(self):
        bf, ref, table, x = self._pair()
        out = bf(table, x)
        assert out.dtype == table.dtype  # upcast back to f32
        self._close(out, ref(table, x))

    def test_custom_vjp_grads_close_and_f32(self):
        bf, ref, table, x = self._pair()

        def g(enc_obj):
            def f(t):
                return jnp.sum(jnp.sin(enc_obj(t, x)))
            return jax.grad(f)(table)

        gb = g(bf)
        assert gb.dtype == table.dtype
        self._close(gb, g(ref))

        def gx(enc_obj):
            def f(xx):
                return jnp.sum(jnp.sin(enc_obj(table, xx)))
            return jax.grad(f)(x)

        self._close(gx(bf), gx(ref))

    def test_encode_with_dx_close(self):
        bf, ref, table, x = self._pair()
        ob, db = bf.encode_with_dx(table=table, x=x)
        orf, drf = ref.encode_with_dx(table=table, x=x)
        assert ob.dtype == table.dtype and db.dtype == table.dtype
        self._close(ob, orf)
        self._close(db, drf)

    def test_stoch_salt_path_close(self):
        """Default SDF training path (stochastic table grads) honours the flag
        in forward AND in its backward re-gather."""
        bf, ref, table, x = self._pair()
        salt = jnp.uint32(7)

        def fwd_and_grads(enc_obj):
            def f(t, xx):
                return jnp.sum(jnp.sin(enc_obj(t, xx, stoch_salt=salt)))
            o = enc_obj(table, x, stoch_salt=salt)
            gt, gxx = jax.grad(f, argnums=(0, 1))(table, x)
            return o, gt, gxx

        ob, gtb, gxb = fwd_and_grads(bf)
        orf, gtr, gxr = fwd_and_grads(ref)
        assert gtb.dtype == table.dtype
        self._close(ob, orf)
        self._close(gtb, gtr)
        self._close(gxb, gxr)
