"""Fuzzy log-to-game matching (SURVEY.md §2.4 J7).

The reference sorts game-controller logs and game-log folders into game
folders by fuzzy filename matching (reference: scripts/sort_logs.py):

- ``candiate_matches`` (sort_logs.py:163-171): date-string containment in
  the filename AND every casefolded search keyword of BOTH teams contained
  in the casefolded filename; a team missing from the search-key table
  never matches (the KeyError branch).
- ``find_gc_logs`` (sort_logs.py:193-199): games are processed in order and
  each matching candidate is REMOVED from the pool — a candidate matching
  several games goes to the first. Per candidate that is exactly
  "min matching game", so the resolution is expressible as a groupby-min.
- ``played_vs`` (sort_logs.py:208-217): date containment + the OPPONENT's
  keywords + the 'Test' exclusion.
- ``find_game_logs`` (sort_logs.py:248-278): a game claims its candidate
  only when the match is UNIQUE among the remaining pool, then removes it —
  sequential with a shared pool, so later games can become unique after an
  earlier removal. The matching matrix is computed distributed; only the
  (candidate_id, game_idx) pairs reach the driver for the cheap sequential
  resolution over the (small) game list.

The matching itself runs inside ``map_batches`` with the game list
broadcast (dimension-sized), vectorized via pandas ``str.contains``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def compile_games(games: list[dict], search_keys: dict[str, list[str]],
                  mode: str = "gc") -> list[dict]:
    """games: [{game_idx, date, home, away}] -> matchable specs with
    casefolded keys. Games whose team lacks a search key get no keys and
    never match (sort_logs.py:168-170 KeyError policy).

    mode="gc": keys of BOTH teams (candiate_matches);
    mode="vs": keys of the opponent only — the non-own team
    (find_game_logs:249-252, own teams 'Berlin United'/'DoBerMan') — plus
    the 'test' exclusion (played_vs).
    """
    own = ("Berlin United", "DoBerMan")
    out = []
    for g in games:
        spec = {"game_idx": g["game_idx"], "date": g["date"], "ok": True,
                "keys": [], "exclude_test": mode == "vs"}
        teams = [g["home"], g["away"]] if mode == "gc" else \
            [g["home"] if g["home"] not in own else g["away"]]
        for t in teams:
            keys = search_keys.get(t)
            if keys is None:
                spec["ok"] = False
                break
            spec["keys"].extend(k.casefold() for k in keys)
        out.append(spec)
    return out


def match_pairs(cands_ds, specs: list[dict], id_col: str = "cand_id",
                name_col: str = "fname"):
    """Dataset of candidate filenames x compiled game specs -> Dataset of
    (cand_id, game_idx) match pairs. Specs broadcast once; containment
    tests vectorized per batch."""
    import ray

    ref = ray.put(specs)

    def matcher(t: pa.Table) -> pa.Table:
        gs = ray.get(ref)
        names = pd.Series(t[name_col].to_pylist(), dtype=str)
        lower = names.str.casefold()
        ids = t[id_col].to_numpy()
        out_c: list[int] = []
        out_g: list[int] = []
        for g in gs:
            if not g["ok"]:
                continue
            mask = names.str.contains(g["date"], regex=False)
            for k in g["keys"]:
                mask &= lower.str.contains(k, regex=False)
            if g["exclude_test"]:
                mask &= ~lower.str.contains("test", regex=False)
            hit = ids[mask.to_numpy()]
            out_c.extend(hit.tolist())
            out_g.extend([g["game_idx"]] * len(hit))
        return pa.table({"cand_id": pa.array(out_c, pa.int64()),
                         "game_idx": pa.array(out_g, pa.int64())})

    return cands_ds.map_batches(matcher, batch_format="pyarrow")


def assign_first_match(pairs_ds) -> pd.DataFrame:
    """find_gc_logs semantics: candidate -> first (minimum-index) matching
    game. Native distributed Min aggregate over the skinny pairs."""
    from ray.data.aggregate import Min

    out = (pairs_ds.groupby("cand_id")
           .aggregate(Min("game_idx", alias_name="game_idx"))
           .to_pandas())
    return (out.sort_values("cand_id").reset_index(drop=True)
            .astype({"cand_id": np.int64, "game_idx": np.int64}))


def assign_unique_with_removal(pairs: pd.DataFrame,
                               game_order: list[int]) -> pd.DataFrame:
    """find_game_logs semantics (sort_logs.py:255-278): iterate games in
    order; a game claims its candidate only if EXACTLY ONE unclaimed
    candidate matches, then removes it from the pool. Driver-side over the
    skinny pair list only."""
    by_game: dict[int, list[int]] = {}
    for c, g in zip(pairs["cand_id"], pairs["game_idx"]):
        by_game.setdefault(int(g), []).append(int(c))
    claimed: set[int] = set()
    rows = []
    for g in game_order:
        live = [c for c in by_game.get(g, []) if c not in claimed]
        if len(live) == 1:  # ambiguous or absent -> warn-and-skip branch
            claimed.add(live[0])
            rows.append((live[0], g))
    return pd.DataFrame(rows, columns=["cand_id", "game_idx"]).astype(np.int64)
