from .experiment import Experiment, ExperimentResults, Task
