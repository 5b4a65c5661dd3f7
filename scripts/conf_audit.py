"""Config-zoo 1:1 audit (VERDICT r3 #7): map every reference yml under
/root/reference/conf to a repo conf (or a documented n/a), write
CONF_AUDIT.md, and exit non-zero on unexplained gaps.

Run: python scripts/conf_audit.py [--reference /root/reference/conf]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference-relative path → (repo conf name | None, reason-if-None)
NA = {
    "coco_yolov5_bak.yml": "dead backup copy (SURVEY §7.4)",
    "coco_yolov6_bak.yml": "dead backup copy (SURVEY §7.4)",
    "portrait_test.yml": "author-machine path duplicate of portrait.yml",
}
NA_DIRS = {
    "pil": "legacy PIL transform duplicates of the cv2 pipeline "
           "(SURVEY §2.3 'pil variants' — not replicated by design)",
}
# normalized-name aliases: reference stem → repo stem
ALIASES = {
    "cityscapes_deeplabv3_r50": "cityscapes_deeplabv3",
    "cityscapes_deeplabv3plus_r50": "cityscapes_deeplabv3plus",
    "cityscapes_pspnet_r50": "cityscapes_pspnet",
    "cityscapes_upernet_r50": "cityscapes_upernet",
    "cityscapes_stdc1": "cityscapes_stdc",
    "coco_nanodetplus": "coco_nanodetplus",
}


def audit(ref_root: str):
    rows = []          # (ref_path, repo_name or '—', note)
    missing = []
    repo_confs = {f[:-4] for f in os.listdir(os.path.join(REPO, "conf"))
                  if f.endswith(".yml")}
    repo_dicts = {f[:-4] for f in
                  os.listdir(os.path.join(REPO, "conf", "dicts"))}
    for root, _, files in os.walk(ref_root):
        for f in sorted(files):
            if not f.endswith(".yml"):
                continue
            rel = os.path.relpath(os.path.join(root, f), ref_root)
            parts = rel.split(os.sep)
            stem = f[:-4]
            if f in NA:
                rows.append((rel, "—", NA[f]))
                continue
            if parts[0] in NA_DIRS:
                rows.append((rel, "—", NA_DIRS[parts[0]]))
                continue
            if parts[0] == "dicts":
                if stem in repo_dicts:
                    rows.append((rel, f"dicts/{stem}", "dictionary"))
                else:
                    missing.append(rel)
                    rows.append((rel, "MISSING", ""))
                continue
            target = ALIASES.get(stem, stem)
            if target in repo_confs:
                note = ("deduplicated: conf/det|seg|ext subdirs are "
                        "flattened to one top-level zoo"
                        if len(parts) > 1 else "")
                rows.append((rel, target, note))
            else:
                missing.append(rel)
                rows.append((rel, "MISSING", ""))
    return rows, missing


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference/conf")
    ap.add_argument("--out", default=os.path.join(REPO, "CONF_AUDIT.md"))
    args = ap.parse_args(argv)
    rows, missing = audit(args.reference)
    lines = [
        "# Config-zoo audit — reference `conf/` → repo `conf/`",
        "",
        f"{len(rows)} reference ymls audited; "
        f"{sum(1 for r in rows if r[1] not in ('—', 'MISSING'))} mapped, "
        f"{sum(1 for r in rows if r[1] == '—')} documented n/a, "
        f"{len(missing)} missing.",
        "",
        "| reference | repo | note |",
        "|---|---|---|",
    ]
    for rel, tgt, note in rows:
        lines.append(f"| `{rel}` | `{tgt}` | {note} |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}: {len(rows)} rows, {len(missing)} missing")
    for m in missing:
        print("MISSING:", m)
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
