"""Shared helper for the example drivers: persist the autonomous run's
summary next to its trajectory so downstream tooling (e.g.
scripts/write_results_md.py) can attribute per-run counts exactly instead
of parsing a shared stdout log by line order (ADVICE r4)."""
import json


def write_run_summary(out, dt, path="run_summary.json"):
    with open(path, "w") as f:
        json.dump({
            "n_frames": int(out["n_frames"]),
            "n_keyframes": int(out["n_keyframes"]),
            "n_loops_closed": int(out["n_loops_closed"]),
            "lost_at": int(out["lost_at"]),
            "n_compact_kf": int(out.get("n_compact_kf", 0)),
            "n_compact_lm": int(out.get("n_compact_lm", 0)),
            "fps": round(float(out["n_frames"]) / dt, 2) if dt > 0 else 0.0,
        }, f, indent=1)
