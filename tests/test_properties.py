"""Property-based tests (hypothesis): invariants that must hold for ALL
valid configurations, not just the handful of fixed cases."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from audiocodec_tpu import native
from audiocodec_tpu.mdct import MDCT
from audiocodec_tpu.psycho import PsychoacousticModel

_settings = settings(max_examples=20, deadline=None)


class TestMDCTProperties:
    @_settings
    @given(
        filters_n=st.sampled_from([4, 8, 30, 64, 100, 256]),
        blocks=st.integers(min_value=1, max_value=9),
        window=st.sampled_from(["vorbis", "sine", None]),
        batch=st.integers(min_value=1, max_value=3),
        channels=st.integers(min_value=1, max_value=3),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_perfect_reconstruction_everywhere(
        self, filters_n, blocks, window, batch, channels, seed
    ):
        """PR holds for any even N, any window, any shape, any data."""
        mdct = MDCT.create(filters_n, window_type=window)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(
            rng.uniform(-1, 1, (batch, blocks * filters_n, channels)),
            dtype=jnp.float32,
        )
        rt = mdct.inverse_transform(mdct.transform(x))
        err = float(
            jnp.max(jnp.abs(x - rt[:, filters_n:-filters_n]))
        ) if blocks * filters_n > 0 else 0.0
        assert err < 1e-4  # scales mildly with N in f32

    @_settings
    @given(
        filters_n=st.sampled_from([8, 64, 128]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_linearity(self, filters_n, seed):
        """The transform is linear: T(a x + b y) == a T(x) + b T(y)."""
        mdct = MDCT.create(filters_n)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, 4 * filters_n, 1)), dtype=jnp.float32
        )
        y = jnp.asarray(
            rng.uniform(-1, 1, (1, 4 * filters_n, 1)), dtype=jnp.float32
        )
        lhs = mdct.transform(0.5 * x + 2.0 * y)
        rhs = 0.5 * mdct.transform(x) + 2.0 * mdct.transform(y)
        np.testing.assert_allclose(
            np.asarray(lhs), np.asarray(rhs), atol=1e-5
        )


class TestPsychoProperties:
    @_settings
    @given(
        sample_rate=st.sampled_from([8000, 16000, 44100, 48000, 96000]),
        filters_n=st.sampled_from([32, 64, 256]),
        bark_n=st.sampled_from([8, 24, 64]),
    )
    def test_bark_maps_conserve_energy(self, sample_rate, filters_n, bark_n):
        """Rows of W and W_inv sum to 1 for every configuration."""
        pa = PsychoacousticModel.create(
            sample_rate, filter_bands_n=filters_n, bark_bands_n=bark_n
        )
        np.testing.assert_allclose(
            np.asarray(jnp.sum(pa.W, axis=1)), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(jnp.sum(pa.W_inv, axis=1)), 1.0, atol=1e-5
        )

    @_settings
    @given(seed=st.integers(min_value=0, max_value=2**31 - 1))
    def test_threshold_positive_and_tonality_bounded(self, seed):
        pa = PsychoacousticModel.create(44100, filter_bands_n=64)
        rng = np.random.default_rng(seed)
        spec = jnp.asarray(
            rng.uniform(-1, 1, (1, 3, 64, 1)), dtype=jnp.float32
        )
        t = pa.tonality(spec)
        assert float(jnp.max(t)) <= 1.0
        thr = pa.global_masking_threshold(spec, t)
        assert float(jnp.min(thr)) > 0.0
        assert bool(jnp.all(jnp.isfinite(thr)))


class TestRiceProperties:
    @_settings
    @given(
        data=st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            min_size=1,
            max_size=2000,
        )
    )
    def test_rice_roundtrip_any_int32(self, data):
        codes = np.asarray(data, dtype=np.int32)
        blob = native.rice_encode(codes)
        got = native.rice_decode(blob, codes.size)
        np.testing.assert_array_equal(got, codes)


class TestStreamingProperties:
    @_settings
    @given(
        blocks=st.integers(min_value=2, max_value=24),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        data=st.data(),
    )
    def test_any_chunking_matches_batch(self, blocks, seed, data):
        """Streaming through ANY valid chunk size equals the batch
        transform (the carried-block invariant, property-tested)."""
        from audiocodec_tpu import streaming
        from audiocodec_tpu.mdct import MDCT

        divisors = [d for d in range(1, blocks + 1) if blocks % d == 0]
        chunk = data.draw(st.sampled_from(divisors))
        mdct = MDCT.create(16)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(
            rng.uniform(-1, 1, (1, blocks * 16, 1)), dtype=jnp.float32
        )
        got = streaming.stream_transform(mdct, x, chunk)
        want = mdct.transform(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )


class TestLosslessProperties:
    @_settings
    @given(
        n=st.integers(min_value=1, max_value=20000),
        channels=st.integers(min_value=1, max_value=3),
        bits=st.sampled_from([16, 24]),
        level=st.sampled_from([1, 2]),
        frame=st.sampled_from([256, 1024, 4096]),
        character=st.sampled_from(["noise", "tone", "ramp", "silence",
                                   "mixed"]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_roundtrip_exact_everywhere(
        self, n, channels, bits, level, frame, character, seed
    ):
        """decode(encode(x)) == x for ANY shape/depth/level/frame and
        signal class — the lossless contract has no fine print."""
        from audiocodec_tpu import lossless

        rng = np.random.default_rng(seed)
        amp = (1 << (bits - 1)) - 1
        t = np.arange(n)
        if character == "noise":
            x = rng.integers(-amp, amp, (n, channels))
        elif character == "tone":
            x = (0.7 * amp * np.sin(2 * np.pi * 0.01 * t))[:, None] * (
                np.linspace(0.5, 1.0, channels)[None, :]
            )
        elif character == "ramp":
            x = np.linspace(-amp, amp, n)[:, None] * np.ones(
                (1, channels)
            )
        elif character == "silence":
            x = np.zeros((n, channels))
        else:
            x = 0.3 * amp * np.sin(2 * np.pi * 0.003 * t)[:, None] * (
                np.ones((1, channels))
            )
            k = max(1, n // 3)
            x[:k] = rng.integers(-amp, amp, (k, channels))
        x = np.asarray(x, np.int32)
        blob = lossless.encode_lossless(x, 44100, bits=bits, frame=frame,
                                        level=level)
        y, rate, b = lossless.decode_lossless(blob)
        assert b == bits and rate == 44100
        np.testing.assert_array_equal(y, x)

    @_settings
    @given(
        start=st.integers(min_value=0, max_value=19999),
        count=st.integers(min_value=1, max_value=25000),
        level=st.sampled_from([1, 2]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_any_range_matches_full_decode(self, start, count, level, seed):
        """Range decode is bit-exact vs the full-decode slice for ANY
        window (clamped at the end; the container is cached per level
        since hypothesis drives many examples)."""
        from audiocodec_tpu import lossless

        blob, x = _range_fixture(level)
        y, _, _ = lossless.decode_lossless(blob, start=start, count=count)
        np.testing.assert_array_equal(
            y, x[start : min(start + count, x.shape[0])]
        )

    @_settings
    @given(
        pos=st.integers(min_value=0, max_value=10**6),
        val=st.integers(min_value=0, max_value=255),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_byte_flips_never_crash(self, pos, val, seed):
        """A corrupted container must either raise ValueError or decode
        to SOMETHING — never segfault, hang, or allocate unboundedly.
        (CRC catches silent wrong decodes on full reads.)"""
        from audiocodec_tpu import lossless

        blob, _ = _range_fixture(2)
        buf = bytearray(blob)
        buf[pos % len(buf)] = val
        try:
            lossless.decode_lossless(bytes(buf))
        except ValueError:
            pass


_RANGE_FIXTURE = {}


def _range_fixture(level):
    from audiocodec_tpu import lossless

    if level not in _RANGE_FIXTURE:
        rng = np.random.default_rng(77)
        t = np.arange(20000)
        l = (9000 * np.sin(2 * np.pi * 0.015 * t)
             + rng.normal(0, 60, t.size)).astype(np.int32)
        x = np.stack([l, (0.8 * l).astype(np.int32)], axis=1)
        _RANGE_FIXTURE[level] = (
            lossless.encode_lossless(x, 44100, level=level), x
        )
    return _RANGE_FIXTURE[level]
