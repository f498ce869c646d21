"""Deterministic Cricsheet-shaped JSON fixture generator (FIXTURES.md §1).

Pure-python, seeded; produces the nested structure the reference consumes
(extract_matchwise...py:56-98, extract_deliverywise...py:100-202)
including the sharp edges: sparse extras/wickets, 'no result' matches
with null margins, missing event/city fields.
"""

from __future__ import annotations

import json
import os
import random

TEAMS = ["India", "Australia", "England", "Pakistan", "New Zealand", "Ireland"]


def make_match(rng: random.Random, match_id: int) -> dict:
    teams = rng.sample(TEAMS, 2)
    no_result = rng.random() < 0.05
    tie = not no_result and rng.random() < 0.03
    innings = []
    n_innings = 1 if no_result and rng.random() < 0.5 else 2
    for i in range(n_innings):
        overs = []
        for over_no in range(rng.randint(5, 20)):
            deliveries = []
            for _ in range(rng.randint(4, 8)):
                ball: dict = {
                    "batter": f"Batter{rng.randint(1, 11)}",
                    "bowler": f"Bowler{rng.randint(1, 6)}",
                    "non_striker": f"Batter{rng.randint(1, 11)}",
                }
                batter_runs = rng.choice([0, 0, 0, 1, 1, 2, 4, 6])
                extras = {}
                if rng.random() < 0.05:
                    kind = rng.choice(["wides", "legbyes", "byes", "noballs", "penalty"])
                    extras[kind] = 1
                extra_total = sum(extras.values())
                ball["runs"] = {
                    "batter": batter_runs,
                    "extras": extra_total,
                    "total": batter_runs + extra_total,
                }
                if extras:
                    ball["extras"] = extras
                if rng.random() < 0.05:
                    wicket = {
                        "player_out": f"Batter{rng.randint(1, 11)}",
                        "kind": rng.choice(["bowled", "caught", "lbw", "run out"]),
                    }
                    if wicket["kind"] == "caught":
                        wicket["fielders"] = [{"name": f"Fielder{rng.randint(1, 11)}"}]
                    ball["wickets"] = [wicket]
                deliveries.append(ball)
            overs.append({"over": over_no, "deliveries": deliveries})
        innings.append({"team": teams[i % 2], "overs": overs})

    if no_result:
        outcome: dict = {"result": "no result"}
    elif tie:
        outcome = {"result": "tie"}
    else:
        winner = rng.choice(teams)
        by = (
            {"runs": rng.randint(1, 100)}
            if rng.random() < 0.5
            else {"wickets": rng.randint(1, 10)}
        )
        outcome = {"winner": winner, "by": by}
        if rng.random() < 0.03:
            outcome["method"] = rng.choice(["D/L", "Awarded"])

    info: dict = {
        "match_type_number": match_id,
        "dates": [
            f"{rng.randint(2005, 2025)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        ],
        "venue": f"Ground{rng.randint(1, 30)}",
        "teams": teams,
        "toss": {"winner": rng.choice(teams), "decision": rng.choice(["bat", "field"])},
        "outcome": outcome,
    }
    if rng.random() > 0.02:
        info["event"] = {"name": f"Series{rng.randint(1, 10)}"}
    if rng.random() > 0.04:
        info["city"] = f"City{rng.randint(1, 20)}"
    if rng.random() > 0.09 and not no_result:
        info["player_of_match"] = [f"Batter{rng.randint(1, 11)}"]

    return {"info": info, "innings": innings}


def write_fixture_dir(path: str, n_matches: int = 20, seed: int = 42) -> list[str]:
    """Write n match files named <match_id>.json; returns file names."""
    os.makedirs(path, exist_ok=True)
    rng = random.Random(seed)
    names = []
    for i in range(n_matches):
        match_id = 100000 + i
        doc = make_match(rng, match_id)
        name = f"{match_id}.json"
        with open(os.path.join(path, name), "w") as f:
            json.dump(doc, f)
        names.append(name)
    return names
