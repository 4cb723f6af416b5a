"""Onboarding GUI + link manager: drive the reducer with key events."""

import numpy as np

from espflix_tpu.streaming.netmgr import (NetworkManager, LinkState,
                                          AUTH_OPEN)
from espflix_tpu.video import gui as G


def make_net(joins=None, links=None, secret_ok="password1"):
    links = links or [("alpha", -40, 1), ("beta", -70, AUTH_OPEN),
                      ("gamma", -90, 1)]
    joins = [] if joins is None else joins

    def join_fn(name, secret):
        joins.append((name, secret))
        return name == "beta" or secret == secret_ok

    return NetworkManager(lambda: links, join_fn), joins


def test_scan_orders_by_quality_and_packs():
    net, _ = make_net()
    net.scan()
    assert net.state() == LinkState.SCANNING
    net.tick()
    assert net.state() == LinkState.SCAN_COMPLETE
    names = list(net.links())
    assert names == ["alpha", "beta", "gamma"]
    packed = net.links()["alpha"]
    assert packed & 0xFF == 1
    q = (packed >> 8) & 0xFF
    assert (q - 256 if q >= 128 else q) == -40


def test_open_link_joins_without_secret():
    net, joins = make_net()
    net.scan(); net.tick()
    g = G.Gui(net)
    g.key(0)                      # absorb state change, draw list
    g.key(G.KEY_DOWN)             # select 'beta' (open)
    g.key(G.KEY_SELECT)           # join immediately
    net.tick()
    assert joins == [("beta", "")]
    assert g.key(0) == 1          # reducer reports completion
    assert net.state() == LinkState.CONNECTED


def test_keyboard_types_secret_and_joins():
    net, joins = make_net()
    net.scan(); net.tick()
    g = G.Gui(net)
    g.key(0)
    g.key(G.KEY_SELECT)           # pick 'alpha' (secured) -> keyboard
    assert g.state == G.ST_SECRET

    def type_char(ch):
        for row, chars in enumerate(G.PWDS):
            if ch in chars:
                while g.row > row:
                    g.key(G.KEY_UP)
                while g.row < row:
                    g.key(G.KEY_DOWN)
                col = chars.index(ch)
                while g.col > col:
                    g.key(G.KEY_LEFT)
                while g.col < col:
                    g.key(G.KEY_RIGHT)
                g.key(G.KEY_SELECT)
                return
        raise AssertionError(ch)

    for ch in "password1":
        type_char(ch)
    assert g.secret == "password1"
    g.key(G.KEY_PLAY)             # play = join shortcut
    assert g.state == G.ST_CONNECTING
    net.tick()
    assert joins == [("alpha", "password1")]
    assert g.key(0) == 1


def test_del_button_and_back():
    net, _ = make_net()
    net.scan(); net.tick()
    g = G.Gui(net)
    g.key(0); g.key(G.KEY_SELECT)
    g.key(G.KEY_SELECT)           # types '0' (row 0, col 0)
    assert g.secret == "0"
    for _ in range(12):           # row 0 past the chars -> del zone
        g.key(G.KEY_RIGHT)
    assert g.col >= 10
    g.key(G.KEY_SELECT)
    assert g.secret == ""
    while g.row < 7:
        g.key(G.KEY_DOWN)
    g.key(G.KEY_LEFT)             # col snaps 12 -> 9 -> 8: back zone
    assert 6 <= g.col < 9
    g.key(G.KEY_SELECT)           # back button
    assert g.state == G.ST_SELECT


def test_short_secret_refuses_join():
    net, joins = make_net()
    net.scan(); net.tick()
    g = G.Gui(net)
    g.key(0); g.key(G.KEY_SELECT)
    g.key(G.KEY_SELECT)           # '0'
    g.key(G.KEY_PLAY)             # join refused (<8 chars, secured)
    net.tick()
    assert joins == []
    assert g.state == G.ST_SECRET


def test_failed_join_returns_to_scan():
    net, joins = make_net(secret_ok="rightpw1")
    net.scan(); net.tick()
    g = G.Gui(net)
    g.key(0); g.key(G.KEY_SELECT)
    g.secret = "wrongpw12"
    g.key(G.KEY_PLAY)
    net.tick()                    # join fails -> rescan
    assert net.state() == LinkState.SCAN_COMPLETE
    assert g.key(0) == 0
    assert g.state == G.ST_SELECT


def test_frames_render_nonempty():
    net, _ = make_net()
    net.scan(); net.tick()
    g = G.Gui(net)
    g.key(0)
    assert int((g.frame > 0).sum()) > 500     # list screen drew
    sel = g.frame.copy()
    g.key(G.KEY_SELECT)
    assert int((g.frame > 0).sum()) > 500     # keyboard drew
    assert not np.array_equal(sel, g.frame)


def test_auto_connect_with_stored_creds(tmp_path):
    class Store:
        def __init__(self):
            self.d = {"link": "alpha", "secret": "password1"}

        def read(self, k):
            return self.d.get(k)

        def write(self, k, v):
            self.d[k] = v

    links = [("alpha", -40, 1)]
    joins = []

    def join_fn(name, secret):
        joins.append((name, secret))
        return True

    net = NetworkManager(lambda: links, join_fn, creds=Store())
    net.auto_connect()
    net.tick()
    assert joins == [("alpha", "password1")]
    assert net.state() == LinkState.CONNECTED
