"""Download the 24-image Kodak set (reference:
data/data_generation_scripts/kodak.py). Requires network access."""

import argparse
import urllib.request
from pathlib import Path

KODAK_URL = "https://r0k.us/graphics/kodak/kodak/kodim{:02d}.png"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=Path, default=Path("data/kodak"))
    args = p.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)
    for i in range(1, 25):
        dst = args.out / f"kodim{i:02d}.png"
        if dst.exists():
            continue
        url = KODAK_URL.format(i)
        print(f"fetching {url}")
        urllib.request.urlretrieve(url, dst)
    print(f"done -> {args.out}")


if __name__ == "__main__":
    main()
