"""DLRM training driver.

TPU-native analog of the reference driver (reference:
examples/cpp/DLRM/dlrm.cc:77-195 top_level_task + CLI dlrm.cc:197-260;
run configs run_criteo_kaggle.sh / run_random.sh / run_summit.sh).

Usage (mirrors reference flag spelling):
  python examples/dlrm.py -e 1 -b 8192 --arch-embedding-size 1396-550-...
         --arch-mlp-bot 13-512-256-64-16 --arch-mlp-top 224-512-256-1
         --arch-sparse-feature-size 16 [--dataset data.h5 | --data-size N]
         [--mesh 1x8 --budget 1000 --export strategy.json]
"""
import sys

sys.path.insert(0, ".")  # repo-root invocation

from dlrm_flexflow_tpu import FFConfig, LossType, MetricsType, SGDOptimizer
from dlrm_flexflow_tpu.models.dlrm import DLRMConfig, make_dlrm_model
from dlrm_flexflow_tpu.data.synthetic import random_batches


def main(argv=None):
    cfg = FFConfig()
    rest = cfg.update_from_args(argv)
    dlrm_cfg = DLRMConfig.parse_args(rest)
    dlrm_cfg.batch_size = cfg.batch_size

    data_size = cfg.batch_size * 64
    i = 0
    while i < len(rest):
        if rest[i] == "--data-size":
            data_size = int(rest[i + 1])
        i += 1

    model = make_dlrm_model(dlrm_cfg, cfg)
    mesh = plan = None
    if cfg.mesh_shape is not None or cfg.num_devices > 1:
        from dlrm_flexflow_tpu.parallel.mesh import make_mesh
        from dlrm_flexflow_tpu.parallel.plan import dlrm_hybrid_plan

        mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
        plan = dlrm_hybrid_plan()
    model.compile(
        SGDOptimizer(lr=cfg.learning_rate, weight_decay=cfg.weight_decay),
        LossType.LOSS_BINARY_CROSSENTROPY,
        [MetricsType.METRICS_ACCURACY, MetricsType.METRICS_AUC_ROC],
        mesh=mesh,
        plan=plan,
    )

    if cfg.dataset_path:
        from dlrm_flexflow_tpu.data.criteo import load_criteo

        feeds, labels, _ = load_criteo(cfg.dataset_path, dlrm_cfg.num_tables)
    else:
        feeds, labels = random_batches(dlrm_cfg, data_size, seed=cfg.seed)

    hist = model.fit(feeds, labels, epochs=cfg.epochs, verbose=True)
    print(f"THROUGHPUT = {hist['throughput']:.2f} samples/s "
          f"(first epoch {hist.get('first_epoch_time_s', 0):.1f}s compile+run)")
    return hist


if __name__ == "__main__":
    main()
