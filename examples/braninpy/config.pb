# Branin-Hoo experiment config (reference examples/braninpy/config.pb
# grammar: protobuf text format).
language: PYTHON
name: "branin"

variable {
 name: "X"
 type: FLOAT
 size: 2
 min: 0
 max: 1
}
