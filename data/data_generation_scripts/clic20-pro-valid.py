"""Download the CLIC2020 professional validation set (reference:
data/data_generation_scripts/clic20-pro-valid.py). Requires network access."""

import argparse
import urllib.request
import zipfile
from pathlib import Path

CLIC_URL = (
    "https://data.vision.ee.ethz.ch/cvl/clic/professional_valid_2020.zip"
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=Path, default=Path("data/clic20-pro-valid"))
    args = p.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)
    zip_path = args.out / "clic20.zip"
    if not zip_path.exists():
        print(f"fetching {CLIC_URL}")
        urllib.request.urlretrieve(CLIC_URL, zip_path)
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(args.out)
    print(f"done -> {args.out}")


if __name__ == "__main__":
    main()
