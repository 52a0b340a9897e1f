"""Naive reading-order: cluster regions by top edge (1-D DBSCAN), sort
clusters top-to-bottom and members top-to-bottom
(reference: pero_ocr/layout_engines/naive_sorter.py:42-84)."""

from __future__ import annotations

from typing import List

import numpy as np
from sklearn.cluster import DBSCAN

from pero_ocr_tpu.core.layout import PageLayout


class NaiveRegionSorter:
    def __init__(self, config=None, config_path: str = ""):
        if config is not None and hasattr(config, "getint"):
            self.width_denom = config.getint("ImageWidthDenominator", fallback=10)
        else:
            self.width_denom = 10

    def process_page(self, image, page_layout: PageLayout) -> PageLayout:
        if len(page_layout.regions) < 2:
            return page_layout
        eps = image.shape[1] // self.width_denom
        y_min = np.asarray(
            [np.asarray(r.polygon)[:, 1].min() for r in page_layout.regions]
        )
        order = self.sort_regions(y_min, eps)
        page_layout.regions = [page_layout.regions[i] for i in order]
        return page_layout

    @staticmethod
    def sort_regions(y_min: np.ndarray, eps: float) -> List[int]:
        labels = DBSCAN(eps=max(eps, 1), min_samples=1).fit_predict(
            y_min.reshape(-1, 1)
        )
        clusters, first_member = np.unique(labels, return_index=True)
        cluster_order = sorted(clusters, key=lambda c: y_min[first_member[c]])
        order: List[int] = []
        for cluster in cluster_order:
            members = np.argwhere(labels == cluster).reshape(-1)
            order.extend(sorted(members, key=lambda i: y_min[i]))
        return order
