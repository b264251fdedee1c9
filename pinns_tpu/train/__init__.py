from pinns_tpu.train.trainer import Problem, Trainer, TrainState, build_problem
from pinns_tpu.train.evaluate import predict_fields, relative_l2
