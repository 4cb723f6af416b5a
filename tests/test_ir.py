"""IR protocol decoders: synthesized scanline-rate waveforms -> events.

Each protocol gets a waveform synthesizer that emits GPIO samples at
scanline resolution (63.55us ticks, the reference's ir_sample rate);
the decoders must recover codes, checksums, player IDs and HID reports.
"""

import numpy as np

from espflix_tpu.runtime import ir


def runs_to_samples(runs, idle=1, tail=300):
    """[(level, nticks), ...] -> sample vector, with trailing idle."""
    out = []
    for level, n in runs:
        out.extend([level] * n)
    out.extend([idle] * tail)
    return np.array(out, np.uint8)


# ---------------------------------------------------------------------------
# NEC / Apple
# ---------------------------------------------------------------------------

def nec_runs(code32):
    """9ms preamble low, 4.5ms start high, 32 mark/space bits."""
    runs = [(0, 142), (1, 71)]
    for i in range(31, -1, -1):
        runs.append((0, 9))
        runs.append((1, 27 if (code32 >> i) & 1 else 9))
    runs.append((0, 9))
    return runs


def nec_repeat_runs():
    return [(0, 142), (1, 35), (0, 9)]


def apple_code32(key7):
    # Apple key sits in bits 14-8 of the low 16 bits of the 32-bit code
    return 0x77E10000 | (key7 << 8) | 0x23


def feed(decoder_input, runs):
    decoder_input.feed_field(runs_to_samples(runs))


def test_nec_decodes_apple_play():
    inp = ir.IrInput(("nec",))
    feed(inp, nec_runs(apple_code32(ir.APPLE_PLAY)))
    assert inp.get_nec() == ((ir.APPLE_PLAY << 8) | 0x23)


def test_nec_repeat_code():
    inp = ir.IrInput(("nec",))
    feed(inp, nec_runs(apple_code32(ir.APPLE_UP)))
    inp.get_nec()
    feed(inp, nec_repeat_runs())
    assert inp.get_nec() == ir.NEC_REPEAT


def test_nec_hid_report_and_repeat_hold():
    inp = ir.IrInput(("nec",))
    feed(inp, nec_runs(apple_code32(ir.APPLE_LEFT)))
    r = inp.get_hid()
    assert r[:2] == bytes([0xA1, 0x42])
    assert r[2] | (r[3] << 8) == ir.GENERIC_LEFT
    # held via repeat codes: no new report while mask unchanged
    feed(inp, nec_repeat_runs())
    assert inp.get_hid() == b""
    # expires ~15 frames (108ms repeat window) without further repeats
    for _ in range(13):
        assert inp.get_hid() == b""
    r = inp.get_hid()
    assert r and r[2] | (r[3] << 8) == 0


def test_nec_split_across_fields():
    """A code straddling two field boundaries still decodes (carried
    run-length state in EdgeSampler)."""
    inp = ir.IrInput(("nec",))
    s = runs_to_samples(nec_runs(apple_code32(ir.APPLE_MENU)))
    inp.feed_field(s[:100])
    inp.feed_field(s[100:500])
    inp.feed_field(s[500:])
    assert inp.get_nec() == ((ir.APPLE_MENU << 8) | 0x23)


def test_nec_garbage_rejected():
    inp = ir.IrInput(("nec",))
    rng = np.random.default_rng(5)
    inp.feed_field((rng.random(2000) < 0.5).astype(np.uint8))
    # random noise may emit at most garbage; a clean code after noise
    # (idle gap resets the FSM via the long-low rule) still decodes
    inp.get_nec()
    feed(inp, [(0, 255)] + nec_runs(apple_code32(ir.APPLE_DOWN)))
    assert inp.get_nec() == ((ir.APPLE_DOWN << 8) | 0x23)


# ---------------------------------------------------------------------------
# Atari Flashback
# ---------------------------------------------------------------------------

def flashback_runs(code18):
    runs = [(0, 36)]
    for i in range(17, -1, -1):
        runs.append((1, 13 if (code18 >> i) & 1 else 4))
        runs.append((0, 4))
    return runs


def flashback_code(mask12, player):
    s = (mask12 + (mask12 >> 4) + (mask12 >> 8)) & 0xFF
    csum = (s + (1 if player == 0 else -1)) & 0xF
    return (mask12 << 4) | csum


def test_flashback_player1():
    inp = ir.IrInput(("flashback",))
    feed(inp, flashback_runs(flashback_code(ir.GENERIC_FIRE, 0)))
    r = inp.get_hid()
    assert r[:2] == bytes([0xA1, 0x42])
    assert r[2] | (r[3] << 8) == ir.GENERIC_FIRE
    assert r[4] | (r[5] << 8) == 0


def test_flashback_player2():
    inp = ir.IrInput(("flashback",))
    feed(inp, flashback_runs(flashback_code(ir.GENERIC_START, 1)))
    r = inp.get_hid()
    assert r[4] | (r[5] << 8) == ir.GENERIC_START
    assert r[2] | (r[3] << 8) == 0


def test_flashback_bad_checksum_ignored():
    inp = ir.IrInput(("flashback",))
    code = flashback_code(ir.GENERIC_FIRE, 0) ^ 0x3
    feed(inp, flashback_runs(code))
    assert inp.get_hid() == b""


# ---------------------------------------------------------------------------
# RETCON
# ---------------------------------------------------------------------------

def retcon_runs(code16):
    runs = [(0, 13), (1, 6)]
    for i in range(15, -1, -1):
        runs.append((0, 5 if (code16 >> i) & 1 else 9))
        runs.append((1, 6))
    return runs


def test_retcon_buttons_map_to_generic():
    inp = ir.IrInput(("retcon",))
    feed(inp, retcon_runs(0x0400 | 0x0080))    # UP + RIGHT
    r = inp.get_hid()
    assert r[2] | (r[3] << 8) == ir.GENERIC_UP | ir.GENERIC_RIGHT


def test_retcon_player_select_bit15():
    inp = ir.IrInput(("retcon",))
    feed(inp, retcon_runs(0x8000 | 0x1000))    # player 2, SELECT
    r = inp.get_hid()
    assert r[4] | (r[5] << 8) == ir.GENERIC_SELECT
    assert r[2] | (r[3] << 8) == 0


def test_retcon_opposite_directions_rejected():
    inp = ir.IrInput(("retcon",))
    feed(inp, retcon_runs(0x0400 | 0x0200))    # UP+DOWN = bogus
    assert inp.get_hid() == b""


# ---------------------------------------------------------------------------
# WebTV keyboard
# ---------------------------------------------------------------------------

def webtv_byte(key7):
    b = key7 << 1
    if bin(b).count("1") % 2 == 0:
        b |= 1
    return b


def webtv_runs(cmd8, key_byte):
    """Preamble + start + 16 UART bits (12 ticks per bit)."""
    word = (cmd8 << 8) | key_byte
    runs = [(0, 38), (1, 11)]
    bits = [(word >> i) & 1 for i in range(15, -1, -1)]
    i = 0
    while i < len(bits):
        j = i
        while j < len(bits) and bits[j] == bits[i]:
            j += 1
        runs.append((bits[i], 12 * (j - i)))
        i = j
    # hold the final level past a full baud (stop period): the decoder
    # reconstructs the trailing parity bit from whether the last run
    # ended promptly (<=1 baud leftover -> 1) or stretched (-> 0)
    runs[-1] = (runs[-1][0], runs[-1][1] + 18)
    # close the last run with an opposite level so its edge fires
    runs.append((1 - runs[-1][0], 30))
    return runs


def test_webtv_keydown_scancode():
    inp = ir.IrInput(("webtv",))
    key_a = 0x78 >> 1                     # 'A' -> usage 0x04
    feed(inp, webtv_runs(0x4A, webtv_byte(key_a)))
    r = inp.get_hid()
    assert r[:2] == bytes([0xA1, 0x01])
    assert 0x04 in r[4:10]


def test_webtv_modifier_and_release():
    inp = ir.IrInput(("webtv",))
    shift = 0x8C >> 1                     # LShift
    feed(inp, webtv_runs(0x4A, webtv_byte(shift)))
    r = inp.get_hid()
    assert r and r[2] == 0x02             # KEY_MOD_LSHIFT
    feed(inp, webtv_runs(0x5E, webtv_byte(shift)))
    r = inp.get_hid()
    assert r and r[2] == 0x00


def test_webtv_bad_parity_dropped():
    inp = ir.IrInput(("webtv",))
    key_a = 0x78 >> 1
    feed(inp, webtv_runs(0x4A, webtv_byte(key_a) ^ 1))
    assert inp.get_hid() == b""


# ---------------------------------------------------------------------------
# integration with the key dispatch map
# ---------------------------------------------------------------------------

def test_nec_to_player_key():
    from espflix_tpu.runtime.input import apple_to_key
    inp = ir.IrInput(("nec",))
    feed(inp, nec_runs(apple_code32(ir.APPLE_PLAY)))
    nec = inp.get_nec()
    assert apple_to_key(nec) != 0
