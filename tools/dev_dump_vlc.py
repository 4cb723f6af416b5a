#!/usr/bin/env python3
"""Dev tool: enumerate ISO/IEC 11172-2 Annex B VLC code tables.

The MPEG-1 VLC tables (B.1 macroblock address increment, B.2 macroblock
type, B.3 coded block pattern, B.4 motion code, B.5/13818-2 B-14 DCT
coefficients) are public-standard constants. This script recovers them in
canonical (bitstring -> value) form by walking the binary-tree-FSM encoding
of those same standard tables in the reference (/root/reference/src/
player.cpp:59-148), purely to cross-check the hand-written spec tables in
espflix_tpu/core/vlc_tables.py. It emits Python dict literals.
"""

import re
import sys

REF = "/root/reference/src/player.cpp"


def parse_u32_array(src: str, name: str):
    m = re.search(rf"{name}\[\d*\]\s*=\s*\{{(.*?)\}};", src, re.S)
    body = m.group(1)
    return [int(x, 16) for x in re.findall(r"0x([0-9A-Fa-f]{8})", body)]


def walk_tree(tab):
    """Enumerate (bitstring, leaf_value) pairs of a tree-in-array table.

    Node encoding (player.cpp:516-530): entry e; if e >> 24 != 0 it is an
    internal node whose bit-0 child index is (e >> 24) & 0xFF and bit-1
    child index is (e >> 16) & 0xFF (0xFF = invalid); else it is a leaf
    whose value is the signed low 16 bits.
    """
    out = {}

    def rec(state, prefix):
        e = tab[state]
        if (e >> 24) == 0 and prefix:
            v = e & 0xFFFF
            if v >= 0x8000:
                v -= 0x10000
            out[prefix] = v
            return
        for bit, shift in ((0, 24), (1, 16)):
            child = (e >> shift) & 0xFF
            if child == 0xFF:
                continue
            if child == 0 and not (bit == 0 and shift == 24 and state == 0):
                # index 0 is the root; a 0 child in a non-root slot would be
                # a cycle -- treat as invalid (does not occur in practice).
                if tab[0] >> 24:
                    pass
            rec(child, prefix + str(bit))

    rec(0, "")
    return out


def main():
    src = open(REF).read()
    for name in [
        "macroblock_address_increment",
        "macroblock_type_I",
        "macroblock_type_P",
        "macroblock_type_B",
        "coded_block_pattern",
        "motion_vec",
        "dct_coeff",
    ]:
        tab = parse_u32_array(src, name)
        codes = walk_tree(tab)
        print(f"{name} = {{")
        for k in sorted(codes, key=lambda s: (len(s), s)):
            v = codes[k]
            if name == "dct_coeff":
                run, lev = (v >> 8) & 0xFF, v & 0xFF
                print(f"    '{k}': ({run}, {lev}),")
            else:
                print(f"    '{k}': {v},")
        print("}\n")


if __name__ == "__main__":
    sys.exit(main())
