from dvae_tpu.training.step import (TrainState, create_train_state,
                                    make_train_step, make_train_epoch,
                                    make_eval_step, make_eval_epoch,
                                    kl_weight_vector)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_train_epoch", "make_eval_step", "make_eval_epoch",
           "kl_weight_vector"]
