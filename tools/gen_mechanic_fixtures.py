"""Generate reference-free mechanic fixtures (tests/mechanic_fixtures.json).

Runs the REFERENCE implementation (read-only oracle at /root/reference) over
hand-designed scenario boards for each special-tile mechanic — activation
(bomb / lasers / cookie / chains, `board.py:473-556`), creation-position
rules (`board.py:429-458`) and all combination-match cases
(`board.py:600-719`) — and records exact before/after grids + stats.

The emitted JSON is an INDEPENDENT oracle: once generated, the standalone
suite `tests/ops/test_mechanics_standalone.py` replays it against our
kernels with no reference mount required (the reference-produced expected
values are data, like the upstream golden episodes).

Usage:  python tools/gen_mechanic_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from oracle import get_ref_board_module  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "mechanic_fixtures.json")

ALL_SPECIALS = dict(
    colourless=["cookie"],
    colour=["vertical_laser", "horizontal_laser", "bomb"],
)


def fresh_board(R, C, K, colour, kind):
    m = get_ref_board_module()
    b = m.Board(R, C, K, ALL_SPECIALS["colourless"], ALL_SPECIALS["colour"],
                np.random.default_rng(0),
                board=np.stack([np.asarray(colour, np.int32),
                                np.asarray(kind, np.int32)]))
    # counters normally initialised at the top of move() (`board.py:343`)
    b.num_specials_activated = 0
    b.num_new_specials = 0
    return b


def grid(R, C, K, seed=0):
    """A deterministic match-free-ish colour grid (values 1..K)."""
    rng = np.random.default_rng(seed)
    r = np.arange(R)[:, None]
    c = np.arange(C)[None, :]
    g = ((r * 2 + c) % K) + 1
    # sprinkle some noise without creating uniform regions
    mask = rng.random((R, C)) < 0.2
    g = np.where(mask, (g % K) + 1, g)
    return g.astype(np.int32)


def activation_scenarios():
    """(name, R, C, K, colour, kind, (r, c)) — activate the special at (r,c)."""
    out = []

    def base(R, C, K, seed=0):
        return grid(R, C, K, seed), np.ones((R, C), np.int32)

    # bomb centre
    col, kin = base(5, 5, 4)
    kin[2, 2] = 4
    out.append(("bomb_centre", 5, 5, 4, col, kin, (2, 2)))
    # bomb corner (edge clipping)
    col, kin = base(5, 5, 4, 1)
    kin[0, 0] = 4
    out.append(("bomb_corner_clip", 5, 5, 4, col, kin, (0, 0)))
    # bomb bottom edge
    col, kin = base(6, 4, 3, 2)
    kin[5, 2] = 4
    out.append(("bomb_bottom_edge", 6, 4, 3, col, kin, (5, 2)))
    # vertical laser
    col, kin = base(5, 5, 4, 3)
    kin[1, 3] = 2
    out.append(("v_laser", 5, 5, 4, col, kin, (1, 3)))
    # horizontal laser
    col, kin = base(5, 5, 4, 4)
    kin[3, 1] = 3
    out.append(("h_laser", 5, 5, 4, col, kin, (3, 1)))
    # chain: v-laser at (2,2) hits bomb at (4,2); bomb catches h-laser (4,1)
    col, kin = base(5, 5, 4, 5)
    kin[2, 2] = 2
    kin[4, 2] = 4
    kin[4, 1] = 3
    out.append(("chain_laser_bomb_laser", 5, 5, 4, col, kin, (2, 2)))
    # chain order: h-laser hits two specials left-to-right
    col, kin = base(5, 6, 4, 6)
    kin[2, 0] = 3
    kin[2, 3] = 2
    kin[2, 5] = 4
    out.append(("chain_h_laser_two_children", 5, 6, 4, col, kin, (2, 0)))
    # cookie: deletes most-common colour's normals, activates its specials
    col, kin = base(5, 5, 4, 7)
    col[0, :] = 2  # make colour 2 clearly most common
    col[1, :3] = 2
    kin[3, 3] = 2
    col[3, 3] = 2  # a special of the chosen colour → activated by cookie
    kin[1, 1] = -1
    col[1, 1] = 0
    out.append(("cookie_most_common", 5, 5, 4, col, kin, (1, 1)))
    # laser hits a cookie mid-row (cookie activated passively)
    col, kin = base(5, 5, 4, 8)
    kin[2, 1] = 3
    kin[2, 4] = -1
    col[2, 4] = 0
    out.append(("laser_hits_cookie", 5, 5, 4, col, kin, (2, 1)))
    # empty board no-op
    col = np.zeros((4, 4), np.int32)
    kin = np.zeros((4, 4), np.int32)
    kin[1, 1] = 4
    out.append(("empty_board_noop", 4, 4, 3, col, kin, (1, 1)))
    return out


def combination_scenarios():
    """(name, R, C, K, colour, kind, c1, c2) — post-swap board, then
    combination_match(c1, c2) exactly as `board.py:357-361` calls it."""
    out = []

    def base(R, C, K, seed):
        return grid(R, C, K, seed), np.ones((R, C), np.int32)

    def put(col, kin, r, c, kind_code, colour_val):
        kin[r, c] = kind_code
        col[r, c] = colour_val

    specs = [
        ("cookie_cookie", -1, 0, -1, 0),
        ("cookie_normal", -1, 0, 1, None),  # None → keep grid colour
        ("cookie_bomb", -1, 0, 4, None),
        ("cookie_vlaser", -1, 0, 2, None),
        ("cookie_hlaser", -1, 0, 3, None),
        ("vlaser_vlaser", 2, None, 2, None),
        ("vlaser_hlaser", 2, None, 3, None),
        ("hlaser_hlaser", 3, None, 3, None),
        ("bomb_bomb", 4, None, 4, None),
        ("bomb_vlaser", 4, None, 2, None),
        ("bomb_hlaser", 4, None, 3, None),
    ]
    for i, (name, k1, c1v, k2, c2v) in enumerate(specs):
        col, kin = base(6, 6, 4, 10 + i)
        r, c = 2, 2
        put(col, kin, r, c, k1, col[r, c] if c1v is None else c1v)
        put(col, kin, r, c + 1, k2, col[r, c + 1] if c2v is None else c2v)
        out.append((name, 6, 6, 4, col, kin, (r, c), (r, c + 1)))
        # also a vertical-pair variant near an edge for clipping behaviour
        col, kin = base(6, 6, 4, 40 + i)
        r, c = 4, 5
        put(col, kin, r, c, k1, col[r, c] if c1v is None else c1v)
        put(col, kin, r + 1, c, k2, col[r + 1, c] if c2v is None else c2v)
        out.append((name + "_edge_v", 6, 6, 4, col, kin, (r, c), (r + 1, c)))
    return out


def creation_scenarios():
    """(name, R, C, K, coords, taken, straight) for get_special_creation_pos."""
    return [
        ("straight_odd_middle", 5, 5, 4,
         [(2, 0), (2, 1), (2, 2), (2, 3), (2, 4)], [], True),
        ("straight_even_lower_middle", 5, 5, 4,
         [(0, 1), (1, 1), (2, 1), (3, 1)], [], True),
        ("straight_taken_skipped", 5, 5, 4,
         [(2, 0), (2, 1), (2, 2), (2, 3)], [(2, 1)], True),
        ("bomb_corner_mode", 5, 5, 4,
         [(1, 1), (1, 2), (1, 3), (0, 2), (2, 2)], [], False),
        ("bomb_corner_taken_closest", 5, 5, 4,
         [(1, 1), (1, 2), (1, 3), (0, 2), (2, 2)], [(1, 2)], False),
    ]


def main():
    ref = get_ref_board_module()
    fx = {"activation": [], "combination": [], "creation_pos": []}

    for name, R, C, K, col, kin, (r, c) in activation_scenarios():
        b = fresh_board(R, C, K, col, kin)
        before = [col.tolist(), kin.tolist()]
        b.activate_special((r, c), int(kin[r, c]), int(col[r, c]))
        fx["activation"].append({
            "name": name, "rows": R, "cols": C, "colours": K,
            "before": before, "coord": [r, c],
            "after": [b.board[0].tolist(), b.board[1].tolist()],
            "num_specials_activated": int(b.num_specials_activated),
        })

    for name, R, C, K, col, kin, c1, c2 in combination_scenarios():
        b = fresh_board(R, C, K, col, kin)
        before = [col.tolist(), kin.tolist()]
        b.combination_match(tuple(c1), tuple(c2))
        fx["combination"].append({
            "name": name, "rows": R, "cols": C, "colours": K,
            "before": before, "coord1": list(c1), "coord2": list(c2),
            "after": [b.board[0].tolist(), b.board[1].tolist()],
            "num_specials_activated": int(b.num_specials_activated),
        })

    for name, R, C, K, coords, taken, straight in creation_scenarios():
        b = fresh_board(R, C, K, grid(R, C, K), np.ones((R, C), np.int32))
        pos = b.get_special_creation_pos(
            [tuple(x) for x in coords], {tuple(t) for t in taken}, straight
        )
        fx["creation_pos"].append({
            "name": name, "rows": R, "cols": C, "colours": K,
            "coords": [list(x) for x in coords],
            "taken": [list(t) for t in taken], "straight": straight,
            "pos": list(pos),
        })

    with open(OUT, "w") as f:
        json.dump(fx, f, indent=1)
    n = sum(len(v) for v in fx.values())
    print(f"wrote {n} fixtures to {OUT}")


if __name__ == "__main__":
    main()
