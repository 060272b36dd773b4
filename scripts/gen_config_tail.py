#!/usr/bin/env python3
"""Generate the missing reference-named configs as minimal BASE overrides.

For each reference yaml we don't ship under the same name, parse it and
every existing same-family config with OUR parser, pick the base whose
resolved tree needs the fewest overrides, and emit a yaml holding just
``BASE: [...]`` plus the differing leaves (environment-specific fields —
DATA_PATH, PRETRAINED, SAVE_DIR — stay generic from the base).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/semantic_segmentation/configs"
OURS = "configs"
SKIP_KEYS = {"DATA.DATA_PATH", "MODEL.PRETRAINED", "SAVE_DIR",
             "MODEL.ENCODER.PRETRAINED",
             # The resolved tree's own BASE leaf must never be re-emitted as
             # an override: YAML last-wins would clobber the real BASE line.
             "BASE"}


def flat(node, prefix=""):
    out = {}
    for k in node.keys():
        v = node[k]
        key = f"{prefix}{k}"
        if hasattr(v, "keys"):
            out.update(flat(v, key + "."))
        else:
            out[key] = v
    return out


def main():
    from emrt_tpu.config import get_config

    ref_files = []
    for root, _, files in os.walk(REF):
        for f in files:
            if f.endswith(".yaml"):
                rel = os.path.relpath(os.path.join(root, f), REF)
                ref_files.append(rel)
    ours = set()
    for root, _, files in os.walk(OURS):
        for f in files:
            if f.endswith(".yaml"):
                ours.add(os.path.relpath(os.path.join(root, f), OURS))

    missing = sorted(r for r in ref_files if r not in ours)
    print(f"{len(missing)} missing configs")

    made, failed = 0, []
    for rel in missing:
        fam = os.path.dirname(rel)
        try:
            ref_cfg = flat(get_config(os.path.join(REF, rel)))
        except Exception as e:
            failed.append((rel, f"parse ref: {e}"))
            continue
        # candidate bases: same-family existing configs
        cands = sorted(o for o in ours if os.path.dirname(o) == fam)
        best, best_diff = None, None
        for cand in cands:
            try:
                base_cfg = flat(get_config(os.path.join(OURS, cand)))
            except Exception:
                continue
            diff = {}
            for k, v in ref_cfg.items():
                if k in SKIP_KEYS:
                    continue
                if base_cfg.get(k) != v:
                    diff[k] = v
            if best_diff is None or len(diff) < len(best_diff):
                best, best_diff = cand, diff
        if best is None:
            failed.append((rel, "no base candidate"))
            continue
        # emit
        base_ref = os.path.relpath(os.path.join(OURS, best),
                                   os.path.dirname(os.path.join(OURS, rel)))
        lines = [f"BASE: ['{base_ref}']"]
        tree = {}
        for k, v in sorted(best_diff.items()):
            parts = k.split(".")
            t = tree
            for p in parts[:-1]:
                t = t.setdefault(p, {})
            t[parts[-1]] = v

        def emit(t, indent=0):
            for k, v in t.items():
                if isinstance(v, dict):
                    lines.append("    " * indent + f"{k}:")
                    emit(v, indent + 1)
                else:
                    if isinstance(v, str):
                        vs = f"'{v}'"
                    elif isinstance(v, tuple):
                        vs = "(" + ", ".join(str(x) for x in v) + ")"
                    else:
                        vs = str(v)
                    lines.append("    " * indent + f"{k}: {vs}")

        emit(tree)
        path = os.path.join(OURS, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        made += 1
        print(f"  {rel}: base={best} overrides={len(best_diff)}")
    print(f"made {made}, failed {len(failed)}")
    for rel, why in failed:
        print("  FAIL", rel, why)


if __name__ == "__main__":
    main()
