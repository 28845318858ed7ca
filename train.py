"""Training CLI.

Flag-for-flag parity with the reference train.py: YAML config as source of
truth, hyperparameter override flags, `--resume <run_dir|ckpt>`, `--debug`
(limit_train_batches=100, wandb off), run-dir creation with persisted
config.yaml + run_id for resume.
"""

import argparse
from pathlib import Path

import numpy as np
import yaml

from pharmaforge_tpu.config.cmdline import (
    merge_config_and_args,
    register_hyperparameter_args,
)
from pharmaforge_tpu.config.load_from_config import (
    data_module_from_config,
    model_from_config,
)
from pharmaforge_tpu.training.logging import MetricsLogger, generate_run_id
from pharmaforge_tpu.training.trainer import Trainer


def parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument('--config', type=str, default=None)
    p.add_argument('--resume', type=Path, default=None)
    p.add_argument('--debug', action='store_true')
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--n_devices', type=int, default=None,
                   help='restrict the data-parallel mesh to this many chips')
    p.add_argument('--distributed', action='store_true',
                   help='multi-host data parallelism: jax.distributed.'
                        'initialize() before any device use; rank 0 owns '
                        'the run dir, logs, and checkpoints')
    p.add_argument('--coordinator', type=str, default=None,
                   help='coordinator address for --distributed (default: '
                        'auto-detected from the TPU pod environment)')
    p.add_argument('--num_processes', type=int, default=None,
                   help='process count for --distributed (default: auto)')
    p.add_argument('--process_id', type=int, default=None,
                   help='this process rank for --distributed (default: auto)')
    p = register_hyperparameter_args(p)
    args = p.parse_args()
    if args.config is not None and args.resume is not None:
        raise ValueError('only specify a config file or a resume file but not both')
    return args


def maybe_make_synthetic(config: dict) -> None:
    """Generate a synthetic processed dataset when requested and absent."""
    ds = config['dataset']
    if not ds.get('synthetic'):
        return
    processed = Path(ds['processed_data_dir'])
    if processed.exists():
        return
    from pharmaforge_tpu.data.synthetic import make_synthetic_processed_dataset
    print(f'generating synthetic processed dataset at {processed}')
    # honor the config's dataset_size cap (reference dev.yml:82): three
    # splits of ~a third each, so the capped total matches
    n_splits = 3
    per_split = max(int(np.ceil((ds.get('dataset_size') or 96) / n_splits)),
                    8)
    # site_rule 'deterministic' makes receptor sites fully inferable from
    # the pocket, giving the validity metric real dynamic range (ceiling
    # ~1.0 vs ~0.65 for 'random'; see scripts/validity_ceiling.py)
    make_synthetic_processed_dataset(
        processed, n_splits=n_splits, samples_per_split=per_split,
        site_rule=ds.get('synthetic_site_rule', 'random'))


if __name__ == '__main__':
    args = parse_arguments()

    from pharmaforge_tpu.utils.misc import setup_jax
    setup_jax()

    if args.distributed:
        # multi-host DP: jax.devices() spans hosts after this; the Trainer
        # feeds each host only its process_local_rows slice and rank 0 owns
        # all writes (the reference's PL/DDP setup crashed on rank>0 —
        # /root/reference/train.py:114-127)
        import jax
        kw = {}
        if args.coordinator is not None:
            kw['coordinator_address'] = args.coordinator
        if args.num_processes is not None:
            kw['num_processes'] = args.num_processes
        if args.process_id is not None:
            kw['process_id'] = args.process_id
        jax.distributed.initialize(**kw)

    ckpt_resume = None
    if args.resume is not None:
        if args.resume.is_dir():
            run_dir = args.resume
            ckpt_resume = 'last'
        elif args.resume.exists():
            run_dir = args.resume.parent.parent
            ckpt_resume = str(args.resume)
        else:
            raise ValueError('resume argument must be a run directory or a '
                             'checkpoint that must already exist')
        config_file = run_dir / 'config.yaml'
    else:
        config_file = args.config
        run_dir = None

    seed = args.seed if args.seed is not None else 0
    np.random.seed(seed)

    with open(config_file, 'r') as f:
        config = yaml.load(f, Loader=yaml.FullLoader)
    config = merge_config_and_args(config, args)

    import jax
    is_main = jax.process_index() == 0
    if is_main:
        maybe_make_synthetic(config)
    if jax.process_count() > 1:
        # non-zero ranks read the dataset rank 0 may have just generated
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('synthetic-dataset-ready')

    data_module = data_module_from_config(config)
    model = model_from_config(config)

    wandb_config = dict(config.get('wandb', {}))
    if args.debug:
        wandb_config['mode'] = 'disabled'
        wandb_config['name'] = 'debug_run'

    output_dir = Path(config['training']['output_dir'])
    output_dir.mkdir(parents=True, exist_ok=True)

    if args.resume is None:
        run_id = generate_run_id()
        if jax.process_count() > 1:
            # all ranks must agree on the run dir: rank 0's id wins
            from jax.experimental import multihost_utils
            buf = np.frombuffer(run_id.encode(), np.uint8).copy()
            buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
            run_id = buf.tobytes().decode()
        wandb_config['id'] = run_id
        name = wandb_config.get('name', 'run').replace(' ', '-')
        run_dir = output_dir / f'{name}_{run_id}'
        config.setdefault('resume', {})['run_id'] = run_id
        if is_main:
            run_dir.mkdir(parents=True, exist_ok=True)
            print('Results are being written to:', run_dir)
            with open(run_dir / 'config.yaml', 'w') as f:
                yaml.dump(config, f)
    else:
        run_id = config.get('resume', {}).get('run_id', 'resumed')
        wandb_config['id'] = run_id
        wandb_config['resume'] = 'must'

    wandb_config['save_dir'] = str(output_dir)
    # rank 0 owns metrics.jsonl/wandb; other ranks get the Trainer's no-op
    # logger (Trainer constructs it when logger is None off-main)
    logger = (MetricsLogger(run_dir, wandb_config, full_config=config)
              if is_main else None)

    trainer = Trainer(config, run_dir, logger=logger, debug=args.debug,
                      seed=seed, n_devices=args.n_devices)
    trainer.fit(model, data_module, resume_from=ckpt_resume)
