"""Dataset-driven sampling / evaluation CLI.

Flag-for-flag parity with the reference test.py: samples N pharmacophores
per pocket over the val (or train) split of the processed dataset, writes
pharms.xyz / per-sample trajectories / pocket.pdb / reference files /
per-pocket timing, and with --metrics computes validity + the type-frequency
histogram. The reverse-diffusion chain itself runs as a single jitted
lax.scan per batch (compiled once per pocket-size bucket).
"""

import argparse
import pickle
import shutil
import time
from pathlib import Path
from typing import List

import numpy as np

from pharmaforge_tpu.analysis.metrics import SampleAnalyzer
from pharmaforge_tpu.analysis.pharm_builder import SampledPharmacophore
from pharmaforge_tpu.config.load_from_config import data_module_from_config
from pharmaforge_tpu.constants import PH_IDX_TO_TYPE
from pharmaforge_tpu.models.size_dist import PharmSizeDistribution
from pharmaforge_tpu.training.restore import load_model, resolve_run_dir
from pharmaforge_tpu.training.sampling import PocketSampler
from pharmaforge_tpu.utils.misc import setup_jax


def parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument('--ckpt', type=Path, default=None,
                   help='Path to checkpoint file. Must be inside model dir.')
    p.add_argument('--model_dir', type=Path, default=None,
                   help='Directory of output from a training run. Will use the '
                        'last checkpoint in this directory.')
    p.add_argument('--samples_per_pocket', type=int, default=1,
                   help='number of samples generated per pocket')
    p.add_argument('--pharm_sizes', nargs='*', type=int, default=[],
                   help='number of pharmacophore centers in each sample, must '
                        'be of length samples per pocket')
    p.add_argument('--max_batch_size', type=int, default=128,
                   help='maximum feasible batch size due to memory constraints')
    p.add_argument('--seed', type=int, default=42)
    p.add_argument('--output_dir', type=Path, default=None)
    p.add_argument('--max_tries', type=int, default=1,
                   help='maximum number of batches to sample per pocket')
    p.add_argument('--dataset_size', type=int, default=None,
                   help='truncate test dataset')
    p.add_argument('--dataset_idx', type=int, default=None)
    p.add_argument('--dataset_idx_as_start', action='store_true',
                   help='Use dataset idx as starting index and sample dataset size')
    p.add_argument('--split', type=str, default='val',
                   help='which data split to use; val or train')
    p.add_argument('--use_ref_pharm_com', action='store_true',
                   help="Initialize each pharmacophore's position at the "
                        "reference pharmacophore's center of mass")
    p.add_argument('--visualize_trajectory', action='store_true',
                   help='Visualize trajectories of generated pharmacophores')
    p.add_argument('--metrics', action='store_true',
                   help='compute metrics on generated pharmacophores')
    p.add_argument('--matmul_precision', type=str, default='float32',
                   choices=['float32', 'tensorfloat32', 'bfloat16'],
                   help='TPU matmul precision for the sampling chain')
    p.add_argument('--n_devices', type=int, default=None,
                   help='shard multi-pocket sampling sweeps over this many '
                        'chips (default: all local devices when >1)')
    p.add_argument('--pockets_per_call', type=int, default=None,
                   help='pockets stacked into one device batch during '
                        'multi-pocket sweeps (default: max_batch_size // '
                        'samples_per_pocket, the measured full-scale knee '
                        'at the defaults — docs/performance.md). 1 restores '
                        'the per-pocket path')
    args = p.parse_args()

    if args.ckpt is None and args.model_dir is None:
        raise ValueError('Must provide either --ckpt or --model_dir')
    if args.pharm_sizes and len(args.pharm_sizes) != args.samples_per_pocket:
        raise ValueError('If pharm_sizes list is provided, must be of length '
                         'samples per pocket')
    return args


def main():
    args = parse_arguments()
    setup_jax(args.matmul_precision)

    run_dir, which = resolve_run_dir(args.ckpt, args.model_dir)
    output_dir = args.output_dir or (run_dir / 'samples')
    output_dir.mkdir(parents=True, exist_ok=True)
    pharm_dir = output_dir

    model, params, config = load_model(run_dir, which)

    rng = np.random.default_rng(args.seed)

    test_data_module = data_module_from_config(config)
    if args.split == 'train':
        test_data_module.setup('fit')
        test_dataset = test_data_module.train_dataset
    else:
        test_data_module.setup('test')
        test_dataset = test_data_module.val_dataset

    # pad every pocket to the dataset-wide slot count so multi-pocket sweeps
    # compile the T-step sampling chain exactly once
    from pharmaforge_tpu.data.batch import bucket_size
    sizes = test_dataset.prot_idx[:, 1] - test_dataset.prot_idx[:, 0]
    import jax as _jax
    n_dev = args.n_devices or _jax.local_device_count()
    mesh = None
    if n_dev > 1:
        from pharmaforge_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_dev)
    sampler = PocketSampler(model, params,
                            pharm_type_map=config['dataset']['ph_type_map'],
                            fixed_prot_slots=bucket_size(int(sizes.max())),
                            mesh=mesh)
    size_dist = PharmSizeDistribution(
        config['dataset'].get('processed_data_dir'), seed=args.seed)

    if args.dataset_idx is None:
        dataset_size = args.dataset_size or len(test_dataset)
        dataset_iterator = range(dataset_size)
    elif args.dataset_idx_as_start:
        if args.dataset_size is None:
            raise ValueError('Must provide dataset size if '
                             'dataset_idx_as_start is used')
        dataset_size = args.dataset_size
        dataset_iterator = range(args.dataset_idx,
                                 args.dataset_idx + dataset_size)
    else:
        dataset_size = 1
        dataset_iterator = range(args.dataset_idx, args.dataset_idx + 1)

    import jax
    key = jax.random.key(args.seed)

    pocket_sampling_times = []
    all_pharms: List[SampledPharmacophore] = []

    def write_pocket_outputs(dataset_idx, sampled_pharms,
                             pocket_sample_time):
        """Per-pocket artifact layout (reference test.py:185-235): timing
        files, xyz/trajectories, pocket.pdb + reference copies."""
        pocket_sampling_times.append(pocket_sample_time)
        pocket_dir = pharm_dir / f'pocket_{dataset_idx}'
        pocket_dir.mkdir(exist_ok=True)
        all_pharms.extend(sampled_pharms)

        with open(pocket_dir / 'sample_time.txt', 'w') as f:
            f.write(f'{pocket_sample_time:.2f}')
        with open(pocket_dir / 'sample_time.pkl', 'wb') as f:
            pickle.dump(pocket_sampling_times, f)

        print(f'Pocket {dataset_idx} sampling time: '
              f'{pocket_sample_time:.2f} seconds')
        print(f'Pocket {dataset_idx} sampling time per pharmacophore: '
              f'{pocket_sample_time / len(sampled_pharms):.2f} seconds')

        raw_data_dir, ref_prot_file, ref_lig_rdmol = \
            test_dataset.get_files(dataset_idx)
        # pocket pdb + reference files require the raw CrossDocked files and
        # rdkit/biopython; degrade gracefully when either is unavailable
        if ref_prot_file is not None and raw_data_dir:
            ref_path = Path(raw_data_dir) / ref_prot_file
            if ref_path.exists():
                try:
                    from pharmaforge_tpu.preprocessing.receptor_utils import (
                        write_pocket_file)
                    write_pocket_file(ref_path, ref_lig_rdmol,
                                      pocket_dir / 'pocket.pdb',
                                      cutoff=config['dataset']['pocket_cutoff'])
                    ref_files_dir = pocket_dir / 'reference_files'
                    ref_files_dir.mkdir(exist_ok=True)
                    shutil.copy(ref_path, ref_files_dir / ref_path.name)
                    if ref_lig_rdmol is not None:
                        from rdkit import Chem
                        w = Chem.SDWriter(str(ref_files_dir / 'ligand.sdf'))
                        w.write(ref_lig_rdmol, confId=0)
                        w.close()
                except ImportError as e:
                    print(f'skipping pocket.pdb/reference files ({e})')

        if args.visualize_trajectory:
            for pharm_idx, sampled_pharm in enumerate(sampled_pharms):
                sampled_pharm.traj_to_xyz(
                    pocket_dir / f'pharm_{pharm_idx}_traj.xyz')
        else:
            pharm_file_content = ''.join(
                ph.to_xyz_file() for ph in sampled_pharms)
            with open(pocket_dir / 'pharms.xyz', 'w') as f:
                f.write(pharm_file_content)

    # gather the sweep up front so multi-pocket iteration can run STACKED
    # (several pockets per device batch, the bench/bench_sweep layout) —
    # the per-pocket loop the reference uses (test.py:159-183) leaves ~3x
    # on the table at full scale (docs/performance.md)
    sweep = []
    for dataset_idx in dataset_iterator:
        pocket = test_dataset[dataset_idx]
        if args.pharm_sizes:
            pharm_sizes = list(args.pharm_sizes)
        else:
            pharm_sizes = list(size_dist.sample_uniformly(
                args.samples_per_pocket))
        init_com = pocket['pharm_x'].mean(axis=0) if args.use_ref_pharm_com \
            else None
        sweep.append((dataset_idx, pocket, pharm_sizes, init_com))

    samples_each = len(sweep[0][2])
    stacked = (len(sweep) > 1 and not args.visualize_trajectory
               and args.pockets_per_call != 1
               and samples_each <= args.max_batch_size
               and all(len(s[2]) == samples_each for s in sweep))
    if stacked:
        ppc = args.pockets_per_call or max(
            1, args.max_batch_size // samples_each)
        ppc = min(ppc, len(sweep))
        sweep_start = time.time()
        for start in range(0, len(sweep), ppc):
            group = sweep[start:start + ppc]
            n_real = len(group)
            # pad the last chunk by repeating its final pocket so every
            # chunk reuses one compiled program; padded outputs are dropped
            group = group + [group[-1]] * (ppc - n_real)
            coms = None
            if args.use_ref_pharm_com:
                coms = np.stack([g[3] for g in group]).astype(np.float32)
            key, sub = jax.random.split(key)
            t0 = time.time()
            per_pocket = sampler.sample_stacked(
                [g[1] for g in group], [g[2] for g in group], sub,
                init_pharm_com=coms)
            chunk_time = time.time() - t0
            # per-pocket wall time is the stacked call amortized over its
            # pockets (the honest per-pocket cost of this batching)
            for (dataset_idx, _, _, _), pharms in list(
                    zip(group, per_pocket))[:n_real]:
                write_pocket_outputs(dataset_idx, pharms,
                                     chunk_time / n_real)
        total = time.time() - sweep_start
        n_samples = sum(len(s[2]) for s in sweep)
        print(f'Sweep: {len(sweep)} pockets x {samples_each} samples in '
              f'{total:.2f}s stacked {ppc}/call '
              f'({n_samples / total:.2f} samples/s)')
    else:
        for dataset_idx, pocket, pharm_sizes, init_com in sweep:
            pocket_sample_start = time.time()
            key, sub = jax.random.split(key)
            sampled_pharms = sampler.sample_pocket(
                pocket, pharm_sizes, sub,
                max_batch_size=args.max_batch_size,
                init_pharm_com=init_com,
                visualize_trajectory=args.visualize_trajectory)
            write_pocket_outputs(dataset_idx, sampled_pharms,
                                 time.time() - pocket_sample_start)

    if args.metrics:
        analyzer = SampleAnalyzer()
        metrics = analyzer.analyze(all_pharms)
        print(metrics)
        # per-type breakdown (extension beyond the reference's single
        # number; appended after the parity line so existing parsers of
        # metrics.txt keep working)
        metrics.update(analyzer.analyze_per_type(all_pharms))
        with open(output_dir / 'metrics.txt', 'w') as f:
            f.write('\n'.join(f'{k}: {v:.3f}' for k, v in metrics.items()))
        with open(output_dir / 'metrics.pkl', 'wb') as f:
            pickle.dump(metrics, f)

        freqs = SampleAnalyzer().pharm_feat_freq(all_pharms)
        with open(output_dir / f'pharm_counts_{args.dataset_idx}.txt', 'w') as f:
            f.write(str(freqs))
        with open(output_dir / f'pharm_counts_{args.dataset_idx}.pkl', 'wb') as f:
            pickle.dump(freqs, f)

        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            plt.bar(PH_IDX_TO_TYPE, freqs)
            plt.xticks(rotation=90)
            plt.xlabel('Pharmacophore Feature')
            plt.ylabel('Feature Count')
            plt.title(f'Pharmacophore Type Counts for {dataset_size} Pockets')
            plt.tight_layout()
            plt.savefig(output_dir / f'pharm_freq_plot_{args.dataset_idx}.png')
        except ImportError:
            pass


if __name__ == '__main__':
    main()
