"""Condition-prefix providers for stage 2.

Reference: `modules/dynamic_modules/label_provider.py` — unconditional
training prefixes each stream with its SOS token; class-conditional reuses
`class_label + threshold` as the content (and optionally position) prefix.

Pure functions of the batch; no parameters.
"""
from __future__ import annotations

import jax.numpy as jnp


class PositionAwareSOSProvider:
    """Per-stream SOS tokens (unconditional)."""

    def __init__(
        self,
        coarse_sos,
        coarse_pos_sos,
        fine_sos=None,
        fine_pos_sos=None,
        coarse_seg_sos=None,
        fine_seg_sos=None,
    ):
        self.coarse_sos = coarse_sos
        self.fine_sos = fine_sos
        self.coarse_pos_sos = coarse_pos_sos
        self.fine_pos_sos = fine_pos_sos
        self.activate_seg = coarse_seg_sos is not None
        self.coarse_seg_sos = coarse_seg_sos
        self.fine_seg_sos = fine_seg_sos

    def encode(self, x):
        b = x.shape[0]
        ones = jnp.ones((b, 1), jnp.int32)
        c_coarse = ones * self.coarse_sos
        c_fine = ones * self.fine_sos if self.fine_sos is not None else None
        c_pos_coarse = ones * self.coarse_pos_sos
        c_pos_fine = ones * self.fine_pos_sos if self.fine_pos_sos is not None else None
        if self.activate_seg:
            return (
                c_coarse,
                c_fine,
                c_pos_coarse,
                c_pos_fine,
                ones * self.coarse_seg_sos,
                ones * self.fine_seg_sos,
            )
        return c_coarse, c_fine, c_pos_coarse, c_pos_fine, None, None


class ClassAwareSOSProvider:
    """class_label + threshold used as content AND position prefixes
    (reference `label_provider.py:90-129`)."""

    def __init__(
        self,
        n_classes,
        threshold_content,
        threshold_coarse_position,
        threshold_fine_position,
        coarse_seg_sos=None,
        fine_seg_sos=None,
    ):
        self.n_classes = n_classes
        self.threshold_content = threshold_content
        self.threshold_coarse_position = threshold_coarse_position
        self.threshold_fine_position = threshold_fine_position
        self.activate_seg = coarse_seg_sos is not None
        self.coarse_seg_sos = coarse_seg_sos
        self.fine_seg_sos = fine_seg_sos

    def encode(self, class_labels):
        x = jnp.asarray(class_labels, jnp.int32).reshape(-1, 1)
        b = x.shape[0]
        ones = jnp.ones((b, 1), jnp.int32)
        c_coarse = x + self.threshold_content
        c_fine = x + self.threshold_content if self.fine_seg_sos is not None else None
        c_pos_coarse = x + self.threshold_coarse_position
        c_pos_fine = (
            x + self.threshold_fine_position if self.fine_seg_sos is not None else None
        )
        if self.activate_seg:
            return (
                c_coarse,
                c_fine,
                c_pos_coarse,
                c_pos_fine,
                ones * self.coarse_seg_sos,
                ones * self.fine_seg_sos,
            )
        return c_coarse, c_fine, c_pos_coarse, c_pos_fine, None, None


class ClassForContentOnlyPositionAwareSOSProvider:
    """Class label as content prefix; plain SOS for positions
    (reference `label_provider.py:48-88`)."""

    def __init__(
        self,
        n_classes,
        threshold,
        coarse_pos_sos,
        fine_pos_sos=None,
        coarse_seg_sos=None,
        fine_seg_sos=None,
    ):
        self.n_classes = n_classes
        self.threshold = threshold
        self.coarse_pos_sos = coarse_pos_sos
        self.fine_pos_sos = fine_pos_sos
        self.activate_seg = coarse_seg_sos is not None
        self.coarse_seg_sos = coarse_seg_sos
        self.fine_seg_sos = fine_seg_sos

    def encode(self, class_labels):
        x = jnp.asarray(class_labels, jnp.int32).reshape(-1, 1)
        b = x.shape[0]
        ones = jnp.ones((b, 1), jnp.int32)
        c_coarse = x + self.threshold
        c_fine = x + self.threshold if self.fine_pos_sos is not None else None
        c_pos_coarse = ones * self.coarse_pos_sos
        c_pos_fine = ones * self.fine_pos_sos if self.fine_pos_sos is not None else None
        if self.activate_seg:
            return (
                c_coarse,
                c_fine,
                c_pos_coarse,
                c_pos_fine,
                ones * self.coarse_seg_sos,
                ones * self.fine_seg_sos,
            )
        return c_coarse, c_fine, c_pos_coarse, c_pos_fine, None, None
