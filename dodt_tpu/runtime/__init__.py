"""Runtime: trainers, evaluators, streaming predictor."""
