from ramdsir_tpu.train.state import TrainState, build_models, init_state  # noqa: F401
from ramdsir_tpu.train.steps import make_predict_fn, make_train_step  # noqa: F401
