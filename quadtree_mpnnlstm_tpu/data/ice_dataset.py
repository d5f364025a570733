"""Sea-ice dataset windowing.

Parity target: ref ice_dataset.py:7-69 — per year×month windows with:
  * train mode widening to ±1 month (ref :29-35);
  * input/output timestep buffers (ref :39-40);
  * injected day-of-year channel (ref :46);
  * per-year-slice min-max normalisation over each variable (ref :48 — a
    known reference quirk, normalisation statistics differ per slice);
  * stride-1 sliding windows (ref :55-58), NaN→0 (ref :56-57);
  * optional ``y > y_binary_thresh`` binarisation (ref :66-67).

Works with an ``xarray.Dataset`` when xarray is installed, or with the
dependency-free :class:`GriddedDataset` numpy container (this image has no
xarray; SURVEY.md §2.5 "stub or gate").
"""

from __future__ import annotations

import datetime
from typing import Dict, Optional, Sequence

import numpy as np

from quadtree_mpnnlstm_tpu.data.loader import ArrayDataset


def _month_add(date: datetime.datetime, months: int) -> datetime.datetime:
    m = date.month - 1 + months
    return date.replace(year=date.year + m // 12, month=m % 12 + 1, day=1)


class GriddedDataset:
    """Minimal (time, lat, lon) multi-variable container.

    ``variables``: name → (T, lat, lon) float arrays;
    ``times``: (T,) np.datetime64[ns].
    """

    def __init__(self, variables: Dict[str, np.ndarray], times: np.ndarray):
        self.variables = {k: np.asarray(v) for k, v in variables.items()}
        self.times = np.asarray(times, dtype="datetime64[ns]")
        first = next(iter(self.variables.values()))
        assert all(v.shape == first.shape for v in self.variables.values())
        assert len(self.times) == first.shape[0]

    @property
    def data_vars(self):
        return list(self.variables.keys())

    @property
    def image_shape(self):
        first = next(iter(self.variables.values()))
        return first.shape[1:]

    @classmethod
    def from_xarray(cls, ds, data_vars: Optional[Sequence[str]] = None):
        names = data_vars or list(ds.data_vars)
        return cls(
            {n: np.asarray(ds[n].values) for n in names},
            np.asarray(ds.time.values),
        )


def _coerce(ds) -> GriddedDataset:
    if isinstance(ds, GriddedDataset):
        return ds
    return GriddedDataset.from_xarray(ds)


class IceDataset(ArrayDataset):
    """ref ice_dataset.py:7-69."""

    def __init__(
        self,
        ds,
        years: Sequence[int],
        month: int,
        input_timesteps: int,
        output_timesteps: int,
        x_vars: Optional[Sequence[str]] = None,
        y_vars: Optional[Sequence[str]] = None,
        train: bool = False,
        y_binary_thresh: Optional[float] = None,
    ):
        self.train = train
        x, y, launch_dates = self._get_xy(
            _coerce(ds), years, month, input_timesteps, output_timesteps,
            x_vars, y_vars, y_binary_thresh,
        )
        super().__init__(x, y, launch_dates)

    def _get_xy(
        self, ds, years, month, input_timesteps, output_timesteps,
        x_vars, y_vars, y_binary_thresh,
    ):
        x_vars = list(ds.data_vars) if x_vars is None else list(x_vars)
        y_vars = list(ds.data_vars) if y_vars is None else list(y_vars)
        rows, cols = ds.image_shape

        xs, ys, lds = [], [], []
        for year in years:
            if self.train:
                # 3 months around the month of interest (ref :29-35)
                start = _month_add(datetime.datetime(year, month, 1), -1)
                end = _month_add(datetime.datetime(year, month, 1), 2)
            else:
                start = datetime.datetime(year, month, 1)
                end = _month_add(datetime.datetime(year, month, 1), 1)
            start -= datetime.timedelta(days=input_timesteps)
            end += datetime.timedelta(days=output_timesteps - 1)

            sel = (ds.times >= np.datetime64(start)) & (
                ds.times <= np.datetime64(end)
            )
            idx = np.nonzero(sel)[0]
            if len(idx) == 0:
                continue
            times = ds.times[idx]

            # assemble (T, rows, cols, V) slice with injected doy channel
            doy = (
                (times - times.astype("datetime64[Y]").astype(times.dtype))
                / np.timedelta64(1, "D")
            ).astype(np.float64) + 1.0
            fields = {}
            for v in set(x_vars + y_vars) - {"doy"}:
                fields[v] = ds.variables[v][idx]
            fields["doy"] = np.broadcast_to(
                doy[:, None, None], (len(idx), rows, cols)
            ).copy()

            # per-year-slice min-max normalisation (ref :48)
            for v, arr in fields.items():
                lo = np.nanmin(arr)
                hi = np.nanmax(arr)
                rng = hi - lo
                fields[v] = (arr - lo) / (rng if rng != 0 else 1.0)

            t_total = len(idx)
            num = t_total - output_timesteps - input_timesteps
            if num <= 0:
                continue
            x_all = np.stack([fields[v] for v in x_vars], axis=-1)
            y_all = np.stack([fields[v] for v in y_vars], axis=-1)
            x_all = np.nan_to_num(x_all)
            y_all = np.nan_to_num(y_all)

            # stride-1 sliding windows; the reference drops the final window
            # (strict < in its while loop, ref :55)
            x_year = np.stack(
                [x_all[i : i + input_timesteps] for i in range(num)]
            )
            y_year = np.stack(
                [
                    y_all[
                        i + input_timesteps : i + input_timesteps
                        + output_timesteps
                    ]
                    for i in range(num)
                ]
            )
            xs.append(x_year)
            ys.append(y_year)
            lds.append(
                times[input_timesteps:-output_timesteps][:num].astype(
                    "datetime64[ns]"
                ).astype(np.int64)
            )

        x = np.concatenate(xs, 0).astype("float32")
        y = np.concatenate(ys, 0).astype("float32")
        launch_dates = np.concatenate(lds, 0)
        if y_binary_thresh is not None:
            y = (y > y_binary_thresh).astype("float32")
        return x, y, launch_dates


def climatology_from_dataset(ds, var: str = "siconc") -> np.ndarray:
    """Day-of-year normals (366, rows, cols), NaN→0.

    Parity: ref ice_exp.py:141-142 (``groupby('time.dayofyear').mean``)."""
    ds = _coerce(ds)
    arr = np.nan_to_num(ds.variables[var])
    times = ds.times
    doy = (
        (times - times.astype("datetime64[Y]").astype(times.dtype))
        / np.timedelta64(1, "D")
    ).astype(np.int64)  # 0-based
    out = np.zeros((366, *ds.image_shape), np.float32)
    counts = np.zeros(366)
    for d in range(366):
        sel = doy == d
        if sel.any():
            out[d] = arr[sel].mean(0)
            counts[d] = sel.sum()
    # fill empty days (e.g. leap day) with the global mean to stay NaN-free
    if (counts == 0).any():
        fill = arr.mean(0)
        out[counts == 0] = fill
    return out
