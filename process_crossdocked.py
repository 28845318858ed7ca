"""Offline preprocessing CLI: CrossDocked2020 -> training tensors.

CLI parity with the reference process_crossdocked.py (--config, --max_workers).
The heavy lifting lives in pharmaforge_tpu.preprocessing.crossdocked; this
driver handles the worker pool, failure filtering and per-split output.
Requires host-side chemistry toolkits (rdkit, biopython, openbabel) and the
`pharmit` binary on PATH.
"""

import argparse
from functools import partial
from pathlib import Path

import numpy as np
import yaml

from pharmaforge_tpu.preprocessing.crossdocked import (
    getfeatures,
    read_types_files,
    write_processed_dataset,
)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", help="Path to config file", required=True,
                        type=Path)
    parser.add_argument("--max_workers", type=int, default=None,
                        help="Number of workers for multiprocessing, defaults "
                             "to all available.")
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.FullLoader)

    crossdocked_path = config["dataset"]["raw_data_dir"]
    crossdocked_data_dir = Path(crossdocked_path) / "CrossDocked2020"
    output_path = config["dataset"]["processed_data_dir"]
    dataset_size = config["dataset"].get("dataset_size")

    allinputs = read_types_files(crossdocked_path, dataset_size)
    if not allinputs:
        raise FileNotFoundError(
            f"no types files matching it2_tt_v1.3_0_test*types under "
            f"{crossdocked_path}/types")

    getfeatures_partial = partial(
        getfeatures, crossdocked_data_dir=crossdocked_data_dir,
        pocket_cutoff=config["dataset"]["pocket_cutoff"])

    for fname, inputs in allinputs:
        chunksize = 20
        print(f"processing types file {fname}")

        try:
            from tqdm.contrib.concurrent import process_map
            if args.max_workers:
                phdata = process_map(getfeatures_partial, inputs,
                                     max_workers=args.max_workers,
                                     chunksize=chunksize)
            else:
                phdata = process_map(getfeatures_partial, inputs,
                                     chunksize=chunksize)
        except ImportError:
            import multiprocessing
            with multiprocessing.Pool(args.max_workers) as pool:
                phdata = pool.map(getfeatures_partial, inputs, chunksize)

        n_samples = len(phdata)
        # drop unparseable ligands, then examples with no pharmacophore points
        phdata = [ex for ex in phdata if ex[2]]
        n_bad_ligands = n_samples - len(phdata)
        phdata = [ex for ex in phdata if isinstance(ex[3][0], np.ndarray)]
        n_bad_pharm = n_samples - len(phdata) - n_bad_ligands

        print(f"{n_samples} samples in {fname}")
        print(f"failed to parse {n_bad_ligands} ligands and failed to obtain "
              f"pharmacophore points for {n_bad_pharm} examples")
        print(f"processed {len(phdata)} examples")

        write_processed_dataset(
            output_path, fname, phdata,
            pocket_element_map=config["dataset"]["prot_elements"],
            min_pharm_centers=config["dataset"]["min_pharm_centers"])
