from dvae_tpu.training.step import (TrainState, create_train_state,
                                    make_train_step, make_eval_step,
                                    kl_weight_vector)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "kl_weight_vector"]
