"""End-to-end smoke (BASELINE.json config 1 and beyond): synthetic depth
sequences -> 3DV generation -> contrastive pretrain steps (both streams) ->
feature extraction -> linear probe. Small shapes, CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.config import (Config, DataConfig, DatagenConfig,
                             GroupingConfig, ModelConfig, OptimConfig,
                             ProbeConfig, TrainConfig)
from facl_tpu.data import CropLoader, NTUPointDataset, write_synthetic_dataset
from facl_tpu.eval import LinearProbeTrainer, combine_streams
from facl_tpu.train import Trainer
from facl_tpu.train.extract import extract_features


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_ntu")
    dg = DatagenConfig(grid_shape=(32, 32, 32), image_shape=(64, 80),
                       sample_num=512, num_appearance_frames=4,
                       voxel_size=80.0, resolutions=(60, 30, 10))
    names = write_synthetic_dataset(str(root), num_videos=6, seed=0,
                                    datagen_cfg=dg)
    return str(root), names


def small_cfg(stream):
    return Config(
        grouping=GroupingConfig(num_centroids=16, knn_k=16, radius_sq=0.06),
        model=ModelConfig(sa_widths=(8, 16), stage2_widths=(16, 32),
                          fc_hidden=32, embed_dim=16, num_prototypes=8,
                          num_crops=10),
        data=DataConfig(dataset="ntu60", protocol="xview", num_points=64,
                        stream=stream),
        train=TrainConfig(batch_size=2, optim=OptimConfig()),
    )


@pytest.mark.slow
def test_full_pipeline(pipeline_root):
    root, names = pipeline_root
    feats = {}
    for stream in ("motion", "appearance"):
        cfg = small_cfg(stream)
        ds_train = NTUPointDataset(root, cfg.data, train=True)
        ds_test = NTUPointDataset(root, cfg.data, train=False)
        assert len(ds_train) + len(ds_test) == len(names)
        B = max(1, min(2, len(ds_train)))
        loader = CropLoader(ds_train, B, jax.random.PRNGKey(0))

        trainer = Trainer(cfg, steps_per_epoch=max(1, len(ds_train) // B))
        sample = next(iter(loader.epoch(0)))[0]
        state = trainer.init_state(jax.random.PRNGKey(0), sample)

        # Two pretrain epochs.
        for epoch in range(2):
            batches = (b for b, _, _ in loader.epoch(epoch))
            state, metrics = trainer.run_epoch(
                state, batches, epoch, jax.random.PRNGKey(epoch))
        assert np.isfinite(metrics["loss"])

        # Extraction over both splits.
        stream_feats = {}
        for ds in (ds_train, ds_test):
            if len(ds) == 0:
                continue
            ld = CropLoader(ds, max(1, min(2, len(ds))),
                            jax.random.PRNGKey(1), shuffle=False,
                            drop_last=False)
            stream_feats.update(extract_features(
                trainer.model, state.variables, cfg, ld.epoch(0)))
        assert len(stream_feats) == len(names)
        D = cfg.model.embed_dim
        for f in stream_feats.values():
            assert f.shape == ((cfg.model.num_crops + 1) * D,)
        feats[stream] = stream_feats

    # Linear probe on concatenated motion+appearance features.
    cfg = small_cfg("motion")
    ds_train = NTUPointDataset(root, cfg.data, train=True)
    ds_test = NTUPointDataset(root, cfg.data, train=False)

    def split_data(ds):
        ns = [ds.names[i] for i in ds.indices]
        ls = [ds.infos[i].label for i in ds.indices]
        return combine_streams(feats["motion"], feats["appearance"], ns, ls)

    tr_f, tr_l = split_data(ds_train)
    te_f, te_l = split_data(ds_test) if len(ds_test) else (tr_f, tr_l)
    pcfg = ProbeConfig(num_classes=60, num_epochs=3, eval_after_epoch=0,
                       batch_size=4)
    probe = LinearProbeTrainer(pcfg, feature_dim=tr_f.shape[1])
    best = probe.fit(tr_f, tr_l, te_f, te_l)
    assert 0.0 <= best["top1"] <= 100.0
    t1, t5 = probe.evaluate(te_f, te_l)
    assert np.isfinite(t1) and np.isfinite(t5)
