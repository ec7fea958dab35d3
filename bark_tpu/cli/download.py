"""`download` CLI: fetch suno/bark checkpoints from Hugging Face.

Mirrors /root/reference/download_weights.py:
  python -m bark_tpu.cli.download --out-dir ./models --models bark-small bark
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPOS = {"bark-small": "suno/bark-small", "bark": "suno/bark"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bark-tpu-download")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--models", nargs="+", default=["bark-small", "bark"],
                    choices=sorted(REPOS))
    args = ap.parse_args(argv)

    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print("download: huggingface_hub is not installed", file=sys.stderr)
        return 1

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for model in args.models:
        print(f"     -> Downloading {model}...", file=sys.stderr)
        target = out_dir / model
        target.mkdir(parents=True, exist_ok=True)
        snapshot_download(
            REPOS[model],
            local_dir=str(target),
            allow_patterns=["*.bin", "*.json", "*.txt"],
        )
    print("Done.", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
