# Hartmann-6 synthetic benchmark (BASELINE config #2: fully-Bayesian GP,
# 20 hyperparameter chains, 2k EI candidates).
# Run: python -m spearmint_tpu.harness.sync examples/hartmann6 \
#        --grid-size=2000 --chooser-args="chains=20"
language: PYTHON
name: "hartmann6"

variable {
 name: "X"
 type: FLOAT
 size: 6
 min: 0
 max: 1
}
