"""GLORYS reanalysis access (parity: ref data/glorys.py:11-43).

Opens the CMEMS ``cmems_mod_glo_phy_my_0.083_P1D-m`` product over OPeNDAP
with CAS authentication, applies the reference's 12-hour time shift
(ref :42) and CRS 4326 tagging. ``pydap``/``xarray`` are optional."""

from __future__ import annotations

PRODUCT = "cmems_mod_glo_phy_my_0.083_P1D-m"
CAS_URL = "https://cmems-cas.cls.fr/cas/login"


def open_glorys(username: str, password: str, product: str = PRODUCT):
    try:
        import numpy as np
        import xarray as xr
        from pydap.cas.get_cookies import setup_session
        from pydap.client import open_url
    except ImportError as e:
        raise ImportError(
            "GLORYS access requires xarray + pydap and CMEMS credentials"
        ) from e

    session = setup_session(CAS_URL, username, password)
    session.cookies.set("CASTGC", session.cookies.get_dict()["CASTGC"])
    url = f"https://my.cmems-du.eu/thredds/dodsC/{product}"
    store = xr.backends.PydapDataStore(open_url(url, session=session))
    ds = xr.open_dataset(store)
    # centre daily means on the day (12 h shift, ref glorys.py:42)
    ds["time"] = ds.time.values - np.timedelta64(12, "h")
    if hasattr(ds, "rio"):
        ds = ds.rio.write_crs(4326)
    return ds
