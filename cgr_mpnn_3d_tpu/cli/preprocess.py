"""Dataset acquisition CLI (reference download_preprocess_datasets.py
__main__, dpd.py:334-337)."""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Download and preprocess the Transition1x dataset "
                    "(offline host step; needs network + ase/transition1x/"
                    "mace packages).")
    ap.add_argument("--download_dir", default="downloaded_datasets")
    ap.add_argument("--out_dir", default="datasets")
    ap.add_argument("--splits", nargs="+",
                    default=["train", "val", "test"])
    ap.add_argument("--rxn_range", default=11961, type=int)
    ap.add_argument("--keep_downloads", action="store_true")
    ap.add_argument("--mace_device", default="cpu")
    args = ap.parse_args(argv)

    from ..data.preprocess import PreProcessTransition1x
    PreProcessTransition1x(
        fpath_download=args.download_dir,
        fpath_processed=args.out_dir,
        rxn_range=args.rxn_range,
        keep_downloads=args.keep_downloads,
        mace_device=args.mace_device,
    ).start_data_acquisition(args.splits)


if __name__ == "__main__":
    main()
