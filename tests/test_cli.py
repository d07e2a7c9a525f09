"""CLI integration tests: the full train → evaluate → cross-analyse flow
through the argparse surface (SURVEY.md §4 item 5)."""

import os

import pytest

from scvae_tpu.cli import build_parser, main


def test_parser_has_subcommands():
    parser = build_parser()
    for argv in (
        ["analyse", "development"],
        ["train", "development", "-m", "GMVAE", "-r", "negative_binomial"],
        ["evaluate", "development"],
        ["cross-analyse", "somewhere"],
    ):
        args = parser.parse_args(argv)
        assert callable(args.func)


def test_train_flags_parse_like_reference_guide():
    # The paper-reproduction command from the reference guide
    # (docs/guide.rst:205-206)
    parser = build_parser()
    args = parser.parse_args(
        [
            "train", "10x-PBMC-PP", "--split-data-set", "-m", "GMVAE",
            "-r", "negative_binomial", "-l", "100", "-H", "100", "100",
            "-w", "200", "-e", "500",
        ]
    )
    assert args.model_type == "GMVAE"
    assert args.latent_size == 100
    assert args.hidden_sizes == [100, 100]
    assert args.number_of_warm_up_epochs == 200
    assert args.number_of_epochs == 500
    assert args.split_data_set



def test_cli_end_to_end(tmp_path):
    data_dir = str(tmp_path / "data")
    models_dir = str(tmp_path / "models")
    analyses_dir = str(tmp_path / "analyses")

    # analyse
    status = main(
        [
            "analyse", "development",
            "-D", data_dir,
            "-E", "random", "400",
            "--split-data-set",
            "-A", analyses_dir,
        ]
    )
    assert status == 0

    # train a small VAE — with the analyses directory, so the
    # intermediate latent plots and the post-training analyse_model call
    # run too (a round-4 regression: train -A raised a NameError)
    status = main(
        [
            "train", "development",
            "-D", data_dir,
            "-E", "random", "400",
            "--split-data-set",
            "-m", "VAE", "-r", "poisson",
            "-l", "2", "-H", "16",
            "-e", "2", "-B", "64",
            "-M", models_dir,
            "-A", analyses_dir,
        ]
    )
    assert status == 0
    curves = []
    for root, _dirs, files in os.walk(analyses_dir):
        curves += [f for f in files if f.startswith("learning_curves")]
    assert curves, "train -A produced no model-level learning curves"

    # evaluate with k-means label prediction
    status = main(
        [
            "evaluate", "development",
            "-D", data_dir,
            "-E", "random", "400",
            "--split-data-set",
            "-m", "VAE", "-r", "poisson",
            "-l", "2", "-H", "16",
            "-B", "64",
            "-M", models_dir,
            "-A", analyses_dir,
            "-P", "kmeans",
            "-K", "3",
        ]
    )
    assert status == 0

    # artifacts exist for cross-analysis
    metric_pickles = []
    for root, _dirs, files in os.walk(analyses_dir):
        metric_pickles += [f for f in files if f.endswith("-metrics.pkl.gz")]
    assert metric_pickles

    status = main(["cross-analyse", analyses_dir, "--log-summary"])
    assert status == 0
    cross_dir = os.path.join(analyses_dir, "cross_analysis", "all")
    assert os.path.exists(os.path.join(cross_dir, "comparison.csv"))
    assert os.path.exists(os.path.join(cross_dir, "all.log"))


def test_cli_train_evaluate_with_mesh(tmp_path):
    """--number-of-devices/--model-parallelism make DP+TP reachable from
    the CLI (greenfield vs the reference; SURVEY.md §2.9)."""
    data_dir = str(tmp_path / "data")
    models_dir = str(tmp_path / "models")

    status = main(
        [
            "train", "development",
            "-D", data_dir,
            "-E", "random", "300",
            "--split-data-set",
            "-r", "negative_binomial",
            "-l", "2", "-H", "8",
            "-e", "2", "-B", "32",
            "-M", models_dir,
            "--number-of-devices", "8",
            "--model-parallelism", "2",
        ]
    )
    assert status == 0

    status = main(
        [
            "evaluate", "development",
            "-D", data_dir,
            "-E", "random", "300",
            "--split-data-set",
            "-r", "negative_binomial",
            "-l", "2", "-H", "8",
            "-B", "32",
            "-M", models_dir,
            "--number-of-devices", "8",
        ]
    )
    assert status == 0
