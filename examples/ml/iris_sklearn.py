"""Mixed framework benchmark on iris (reference
`examples/ml/iris/run_iris.py` advanced stage): the Experiment scheduler
runs cflearn tasks (fcnn/linear) next to sklearn tasks (decision tree /
random forest, via the custom `run_command` runner `run_sklearn.py`), then
everything is evaluated on the same loader through the sklearn bridge
(`SKLearnClassifier` + `GeneralEvaluationPipeline`)."""

import argparse
import os
import pickle
import shutil


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import cflearn_tpu as cf
    from cflearn_tpu.data.ml.api import MLData
    from cflearn_tpu.data.ml.datasets import iris_data
    from cflearn_tpu.dist.ml.experiment import Experiment

    x, y = iris_data()
    data = MLData.init().fit(x, y)

    config = cf.MLConfig(
        module_name="fcnn",
        metric_names=["acc"],
        callback_names=[],
    )
    if ci:
        config.to_debug()

    workspace = "_iris_sklearn"
    shutil.rmtree(workspace, ignore_errors=True)
    experiment = Experiment(num_jobs=1)
    data_folder = experiment.dump_data(data, workspace)

    config_pack = config.to_info()
    experiment.add_task(model="fcnn", config=config_pack, data_folder=data_folder)
    experiment.add_task(model="linear", config=dict(config_pack, module_name="linear"), data_folder=data_folder)
    runner = os.path.join(os.path.dirname(os.path.abspath(__file__)), "run_sklearn.py")
    import sys

    run_command = f"{sys.executable} {runner}"
    common_kwargs = {"run_command": run_command, "data_folder": data_folder}
    experiment.add_task(model="decision_tree", **common_kwargs)
    experiment.add_task(model="random_forest", **common_kwargs)

    results = experiment.run_tasks(workspace)

    pipelines = {k: p for k, p in results.load_pipelines().items()}
    loader = data.get_loaders()[0]
    for (model, idx), folder in results.checkpoint_folders.items():
        if model in ("decision_tree", "random_forest"):
            model_file = os.path.join(folder, "sk_model.pkl")
            with open(model_file, "rb") as f:
                predictor = cf.SKLearnClassifier(pickle.load(f))
            bridge = cf.GeneralEvaluationPipeline(config, predictor)
            outputs = bridge.evaluate(loader)
            print(f"{model}: {outputs.final_score:.4f}")
        elif (model, idx) in pipelines:
            res = cf.evaluate(pipelines[(model, idx)], x, y, metrics="acc")
            print(f"{model}: evaluated")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
