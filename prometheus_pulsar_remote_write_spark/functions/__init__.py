"""Scalar-function surface: Go-parity formatting, FNV hashing, serializers."""
