"""Sequence windowing: overlapping stride-1, same-video windows.

Fixed-semantics re-implementation of the reference's
`create_sequences_from_parsed_annotations`
(/root/reference/utility/preprocessing.py:79-89): the intent is "every
length-T window of consecutive frames that does not straddle a video
(folder) boundary"; the reference's loop-variable mutation makes boundary
windows duplicate the last in-video window (catalogued as a latent bug,
SURVEY.md §4). Here the semantics are exact and tested.
"""

from __future__ import annotations

from typing import List, Sequence

from object_tracking_tpu.data.voc import Annotation


def make_sequence_windows(annotations: Sequence[Annotation],
                          sequence_length: int,
                          stride: int = 1) -> List[List[Annotation]]:
    """Windows of `sequence_length` consecutive same-folder annotations.

    `annotations` must be sorted (parse_annotation_dir sorts by path,
    which sorts frames within a video — the reference relies on the same
    sorted() walk).
    """
    if sequence_length <= 0:
        raise ValueError('sequence_length must be positive')
    windows: List[List[Annotation]] = []
    n = len(annotations)
    for start in range(0, n - sequence_length + 1, stride):
        window = annotations[start:start + sequence_length]
        folder = window[0].folder
        if all(a.folder == folder for a in window):
            windows.append(list(window))
    return windows
