# Branin-Hoo via a compiled C objective (SHELL language path).
# Build first: make -C examples/braninc
language: SHELL
name: "branin"

variable {
 name: "X"
 type: FLOAT
 size: 2
 min: 0
 max: 1
}
