"""OutputStage: OSD state machine, field synthesis, beep + PDM."""

import numpy as np

from espflix_tpu.ops import composite as C
from espflix_tpu.ops import delta_sigma as DS
from espflix_tpu.runtime.output import OutputStage, _SIN32
from espflix_tpu.video.render import PLAY, FFWD


def frames_for(n, h=192, w=352, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 249, (n, h, w)).astype(np.uint8)
    u = rng.integers(0, 249, (n, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 249, (n, h // 2, w // 2)).astype(np.uint8)
    return y, u, v


def test_osd_overlay_visible_then_fades():
    out = OutputStage(2)
    y, u, v = frames_for(2)
    out.update_progress(0, 90000 * 65, 90000 * 100)       # 1:05 / 1:40
    out.show_progress(0, t=2)
    f1 = out.synthesize(y, u, v)
    assert out.frame_counter.tolist() == [1, 1]
    # lane 0 differs from lane-1-style plain synthesis; after the fade
    # runs out the overlay disappears
    out.hide_progress(0)
    out.frame_counter[:] = 0                              # same parity
    f3 = out.synthesize(y, u, v)
    assert not np.array_equal(f1[0], f3[0])               # overlay gone
    assert np.array_equal(f1[1], f3[1])                   # lane 1 clean


def test_progress_units_and_time_rerender():
    out = OutputStage(1)
    out.update_progress(0, 90000 * 50, 90000 * 100)
    assert out.progress[0] == 50 * C.OSD_PROGRESS_W // 100
    osd_a = out.osd[0].copy()
    out.update_progress(0, 90000 * 50 + 1000, 90000 * 100)
    assert np.array_equal(out.osd[0], osd_a)              # same second
    out.update_progress(0, 90000 * 51, 90000 * 100, FFWD)
    assert not np.array_equal(out.osd[0], osd_a)          # re-rendered


def test_icon_selection():
    assert OutputStage.icon_for(0, False) == PLAY
    assert OutputStage.icon_for(2, False) == FFWD
    assert OutputStage.icon_for(0, True) != PLAY
    assert OutputStage.icon_for(-2, False) != FFWD


def test_field_parity_alternates():
    out = OutputStage(1)
    y, u, v = frames_for(1)
    f0 = out.synthesize(y, u, v)
    f1 = out.synthesize(y, u, v)
    f2 = out.synthesize(y, u, v)
    assert not np.array_equal(f0, f1)                     # odd field
    assert np.array_equal(f0, f2)                         # even again


def test_beep_overrides_pcm_and_expires():
    out = OutputStage(2)
    pcm = np.zeros((2, 128), np.int16)
    out.beep(0)
    a = out.modulate(pcm)
    # lane 1 silent input -> the idle pattern dominates; lane 0 differs
    assert not np.array_equal(a[0], a[1])
    # the beep waveform is the reference's >>2 sine
    want = (_SIN32[np.arange(128) & 31] >> 2).astype(np.int16)
    st = DS.init_state(1)
    ref, _ = DS.modulate(want[None, :], st, n_samples=128)
    assert np.array_equal(a[0], np.asarray(ref)[0])
    for _ in range(4):
        out.beep_frames[0] and out.modulate(pcm)
    assert out.beep_frames[0] == 0
    b = out.modulate(pcm)
    c = out.modulate(pcm)
    assert np.array_equal(b[0].shape, c[0].shape)


def test_pdm_state_carries_across_calls():
    out = OutputStage(1)
    rng = np.random.default_rng(7)
    pcm = rng.integers(-3000, 3000, (1, 256)).astype(np.int16)
    a = out.modulate(pcm[:, :128])
    b = out.modulate(pcm[:, 128:])
    st = DS.init_state(1)
    whole, _ = DS.modulate(pcm, st, n_samples=256)
    assert np.array_equal(np.concatenate([a, b], axis=1),
                          np.asarray(whole))


def test_pdm_speculative_bit_identical():
    """modulate_spec (speculative two-path formulation) must be
    bit-identical to modulate — same recurrence, reassociated only
    where int32 wrap-around makes it exact — including carried state
    across chunks and extreme PCM values."""
    rng = np.random.default_rng(13)
    pcm = np.concatenate([
        rng.integers(-32768, 32768, (4, 224)),
        np.full((4, 16), 32767), np.full((4, 16), -32768)],
        axis=1).astype(np.int16)
    st = DS.init_state(4)
    want, wst = DS.modulate(pcm, st, n_samples=256)
    got, gst = DS.modulate_spec(pcm, st, n_samples=256)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    assert np.array_equal(np.asarray(gst), np.asarray(wst))
    # chunked: state carries identically
    g1, s1 = DS.modulate_spec(pcm[:, :128], st, n_samples=128)
    g2, s2 = DS.modulate_spec(pcm[:, 128:], s1, n_samples=128)
    assert np.array_equal(
        np.concatenate([np.asarray(g1), np.asarray(g2)], axis=1),
        np.asarray(want))
    assert np.array_equal(np.asarray(s2), np.asarray(wst))


def test_pal_output_geometry_and_clock(tmp_path):
    """PAL end-to-end at the runtime level: PAL fields from the output
    stage (312x1136 geometry) and PAL pacing in the session clock."""
    from espflix_tpu.video.tables import Geometry
    from espflix_tpu.video.clock import PAL_DIV
    from espflix_tpu.runtime.player import PlayerSession
    from espflix_tpu.tools.indexer import make_service

    g = Geometry(pal=True)
    out = OutputStage(1, pal=True)
    y, u, v = frames_for(1)
    f = out.synthesize(y, u, v)
    assert f.shape == (1, g.line_count, g.line_width)
    assert f.shape[1:] == (312, 1136)

    service = str(tmp_path / "svc")
    make_service(service, ["one"], seed=9, n_gops=1, gop=3)
    s = PlayerSession("file://" + service, pal=True)
    assert s.clock.div == PAL_DIV


def test_slide_animation_sequence_and_blit():
    """Buffer-flip slide: the ease sequence matches video.cpp:1077-1088
    (first field at +-344, easing to 0 over 16 fields) and the scrolled
    field equals synthesizing the numpy wraparound of the two buffers."""
    import jax.numpy as jnp

    from espflix_tpu.ops import composite as C
    from espflix_tpu.runtime.output import OutputStage

    rng = np.random.default_rng(3)
    N, H, W = 2, 192, 352
    y0 = rng.integers(0, 249, (N, H, W), np.uint8)
    u0 = rng.integers(0, 249, (N, H // 2, W // 2), np.uint8)
    v0 = rng.integers(0, 249, (N, H // 2, W // 2), np.uint8)
    y1 = rng.integers(0, 249, (N, H, W), np.uint8)
    u1 = rng.integers(0, 249, (N, H // 2, W // 2), np.uint8)
    v1 = rng.integers(0, 249, (N, H // 2, W // 2), np.uint8)

    out = OutputStage(N)
    out.synthesize(y0, u0, v0)               # establishes _last
    out.start_slide(1, direction=3)          # slide from the right
    assert out.hscroll[1] == 344 and out.hscroll[0] == 0

    seq = []
    for _ in range(17):
        h = int(out.hscroll[1])
        seq.append(h)
        f = out.synthesize(y1, u1, v1)
        if h:
            # lane 1 must equal the plain synthesis of the wrapped
            # planes; lane 0 (h=0) must equal plain synthesis
            def wrap(a, b, off, w):
                cols = (np.arange(w) + off) % (2 * w)
                return np.concatenate([a, b], axis=-1)[..., cols]
            ye = y1.copy(); ue = u1.copy(); ve = v1.copy()
            ye[1] = wrap(y1[1], y0[1], h, W)
            ue[1] = wrap(u1[1], u0[1], h >> 1, W // 2)
            ve[1] = wrap(v1[1], v0[1], h >> 1, W // 2)
            par = ((out.frame_counter - 1) & 1).astype(np.int32)
            want = np.asarray(C.synthesize_field(
                jnp.asarray(ye), jnp.asarray(ue), jnp.asarray(ve),
                jnp.asarray(par), jnp.asarray(out.osd),
                jnp.asarray(out.blend + 1) * 0, jnp.asarray(out.progress),
                pal=False))
            assert np.array_equal(f[1], want[1])
            assert np.array_equal(f[0], want[0])
    assert seq[0] == 344 and seq[-1] == 0 and seq[-2] == 0
    assert all(a >= b for a, b in zip(seq, seq[1:]))
    assert int(out.animate_index[1]) == 0

    # negative direction mirrors the sequence
    out2 = OutputStage(N)
    out2.synthesize(y0, u0, v0)
    out2.start_slide(0, direction=2)
    assert out2.hscroll[0] == -344
