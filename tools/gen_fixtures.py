#!/usr/bin/env python3
"""Generate deterministic pipeline fixtures (FIXTURES.md §A) under
src/test/resources/fixtures/. Committed artifacts — regeneration is
idempotent. Shapes mirror the reference's API payloads; edge rows per
FIXTURES.md: non-numeric values, past-cutoff periods, unknown respondents,
"Total" rows, null county names, wrong-quarter dates, a NaN weather value,
and one short (12 h) weather location.
"""
import json
import math
import os

BASE = os.path.join(os.path.dirname(__file__), "..",
                    "src", "test", "resources", "fixtures")


def w(path, content):
    p = os.path.join(BASE, path)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(content)


def envelope(rows, params):
    return json.dumps(
        {"response": {"data": rows, "total": str(len(rows))},
         "request": {"params": params}}, indent=1)


# ---- EIA-930: hourly, asc by period, cutoff at 2026-08-10T06 -------------
BAS = ["CISO", "ERCO", "MISO"]
hours = [f"2026-08-10T{h:02d}" for h in range(8)]  # 2 past the T06 cutoff

fuel_rows = []
for h in hours:
    for ba, fuel, val in [("CISO", "SUN", "100"), ("CISO", "WND", "50.5"),
                          ("ERCO", "SUN", "75"), ("NOPE", "SUN", "999"),
                          ("MISO", "COL", "not-a-number")]:
        fuel_rows.append({"period": h, "respondent": ba,
                          "respondent-name": f"{ba} name", "fueltype": fuel,
                          "type-name": f"{fuel} name", "value": val,
                          "value-units": "megawatthours"})
for i in range(0, len(fuel_rows), 12):
    w(f"eia930/fuel/page{i // 12}.json",
      envelope(fuel_rows[i:i + 12], {"frequency": "hourly"}))

region_rows = []
for h in hours:
    for ba in ["CISO", "ERCO"]:
        for ty, val in [("D", "10"), ("DF", "11"), ("NG", "12"), ("TI", "1")]:
            region_rows.append({"period": h, "respondent": ba,
                                "respondent-name": f"{ba} name", "type": ty,
                                "type-name": f"{ty} name", "value": val,
                                "value-units": "megawatthours"})
    # MISO reports only D -> dropped by the A2 pivot dropna
    region_rows.append({"period": h, "respondent": "MISO",
                        "respondent-name": "MISO name", "type": "D",
                        "type-name": "Demand", "value": "5",
                        "value-units": "megawatthours"})
for i in range(0, len(region_rows), 40):
    w(f"eia930/region/page{i // 40}.json",
      envelope(region_rows[i:i + 40], {"frequency": "hourly"}))

inter_rows = []
for h in hours:
    inter_rows.append({"period": h, "fromba": "CISO", "fromba-name": "CISO name",
                       "toba": "ERCO", "toba-name": "ERCO name",
                       "value": "7", "value-units": "megawatthours"})
    inter_rows.append({"period": h, "fromba": "ZZZZ", "fromba-name": "unknown",
                       "toba": "CISO", "toba-name": "CISO name",
                       "value": "3", "value-units": "megawatthours"})
w("eia930/interchange/page0.json", envelope(inter_rows, {"frequency": "hourly"}))

w("eia930/ba.csv",
  "BA Code,BA Name,Time Zone,Region/Country Code,Region/Country Name,Generation Only BA\n"
  + "\n".join(f"{b},{b} name,Pacific,US,United States,No" for b in BAS) + "\n")
w("eia930/energy.csv",
  "Energy Source Code,Energy Source Name\nSUN,Solar\nWND,Wind\nCOL,Coal\n")

# ---- EIA-7A: quarterly, desc, target quarter 2026-Q1 ---------------------
customs = [
    {"period": "2026-Q1", "exportImportType": "import", "coalRankId": "BIT",
     "coalRankDescription": "Bituminous", "countryId": "CA",
     "countryDescription": "Canada", "customsDistrictId": "07",
     "customsDistrictDescription": "Buffalo", "price": "120.5",
     "quantity": "1000", "price-units": "usd", "quantity-units": "tons"},
    {"period": "2026-Q1", "exportImportType": "import", "coalRankId": "BIT",
     "coalRankDescription": "Bituminous", "countryId": "CA",
     "countryDescription": "Canada", "customsDistrictId": "00",
     "customsDistrictDescription": "Total", "price": "120.5",
     "quantity": "2000", "price-units": "usd", "quantity-units": "tons"},
    {"period": "2026-Q1", "exportImportType": "export", "coalRankId": "SUB",
     "coalRankDescription": "Subbituminous", "countryId": "MX",
     "countryDescription": "Mexico", "customsDistrictId": "23",
     "customsDistrictDescription": "Laredo", "price": None,
     "quantity": "500", "price-units": "usd", "quantity-units": "tons"},
    {"period": "2026-Q1", "exportImportType": "export", "coalRankId": "SUB",
     "coalRankDescription": "Subbituminous", "countryId": "MX",
     "countryDescription": "Mexico", "customsDistrictId": "23",
     "customsDistrictDescription": "Laredo", "price": "--",
     "quantity": "500", "price-units": "usd", "quantity-units": "tons"},
    {"period": "2025-Q4", "exportImportType": "import", "coalRankId": "BIT",
     "coalRankDescription": "Bituminous", "countryId": "CA",
     "countryDescription": "Canada", "customsDistrictId": "07",
     "customsDistrictDescription": "Buffalo", "price": "99",
     "quantity": "800", "price-units": "usd", "quantity-units": "tons"},
]
w("eia7a/customs/page0.json", envelope(customs[:4], {"frequency": "quarterly"}))
w("eia7a/customs/page1.json", envelope(customs[4:], {"frequency": "quarterly"}))

mines = [
    {"period": "2026-Q1", "plantStateId": "AL", "plantStateDescription": "Alabama",
     "mineStateId": "WV", "mineStateDescription": "West Virginia",
     "mineTypeId": "U", "mineTypeDescription": "Underground",
     "mineMSHAID": "4601234", "mineName": "Mine A", "mineBasinId": "APP",
     "mineBasinDescription": "Appalachia", "mineCountyId": "39",
     "mineCountyName": None, "contractType": "Contract",
     "transportationMode": "Rail", "coalSupplier": "Supplier X",
     "coalRankId": "BIT", "coalRankDescription": "Bituminous",
     "plantId": "3", "plantName": "Plant P", "ash-content": "9.1",
     "heat-content": "12000", "price": "61.2", "quantity": "15000",
     "sulfur-content": "1.9", "ash-content-units": "percent",
     "heat-content-units": "btu", "price-units": "usd",
     "quantity-units": "tons", "sulfur-content-units": "percent"},
    {"period": "2025-Q4", "plantStateId": "AL", "plantStateDescription": "Alabama",
     "mineStateId": "WV", "mineStateDescription": "West Virginia",
     "mineTypeId": "S", "mineTypeDescription": "Surface",
     "mineMSHAID": "4605678", "mineName": "Mine B", "mineBasinId": "APP",
     "mineBasinDescription": "Appalachia", "mineCountyId": "41",
     "mineCountyName": "Boone", "contractType": "Spot",
     "transportationMode": "Truck", "coalSupplier": "Supplier Y",
     "coalRankId": "SUB", "coalRankDescription": "Subbituminous",
     "plantId": "7", "plantName": "Plant Q", "ash-content": "6.5",
     "heat-content": "9000", "price": "40", "quantity": "8000",
     "sulfur-content": "0.7", "ash-content-units": "percent",
     "heat-content-units": "btu", "price-units": "usd",
     "quantity-units": "tons", "sulfur-content-units": "percent"},
]
w("eia7a/mine/page0.json", envelope(mines[:1], {"frequency": "quarterly"}))
w("eia7a/mine/page1.json", envelope(mines[1:], {"frequency": "quarterly"}))

# ---- EIA-814: monthly, stop on empty page --------------------------------
oil = [
    {"period": "2026-05", "originId": "CA", "originName": "Canada",
     "originType": "CTY", "originTypeName": "Country",
     "destinationId": "10", "destinationName": "PADD1",
     "destinationType": "PAD", "destinationTypeName": "PAD District",
     "gradeId": "HSO", "gradeName": "Heavy Sour", "quantity": "5500",
     "quantity-units": "thousand barrels"},
    {"period": "2026-05", "originId": "MX", "originName": "Mexico",
     "originType": "CTY", "originTypeName": "Country",
     "destinationId": "30", "destinationName": "PADD3",
     "destinationType": "PAD", "destinationTypeName": "PAD District",
     "gradeId": "LSW", "gradeName": "Light Sweet", "quantity": "2100",
     "quantity-units": "thousand barrels"},
]
w("eia814/page0.json", envelope(oil[:1], {"frequency": "monthly"}))
w("eia814/page1.json", envelope(oil[1:], {"frequency": "monthly"}))
w("eia814/page2.json", envelope([], {"frequency": "monthly"}))

# ---- Open-Meteo: 2 states x 3 coords, 24 h; one NaN, one 12-h location ---
VARS = ['temperature_2m', 'relative_humidity_2m', 'dew_point_2m',
        'apparent_temperature', 'precipitation', 'rain', 'snowfall',
        'snow_depth', 'weather_code', 'pressure_msl', 'surface_pressure',
        'cloud_cover', 'cloud_cover_low', 'cloud_cover_mid',
        'cloud_cover_high', 'et0_fao_evapotranspiration',
        'vapour_pressure_deficit', 'wind_speed_10m', 'wind_speed_100m',
        'wind_direction_10m', 'wind_direction_100m', 'wind_gusts_10m',
        'soil_temperature_0_to_7cm', 'soil_temperature_7_to_28cm',
        'soil_temperature_28_to_100cm', 'soil_temperature_100_to_255cm',
        'soil_moisture_0_to_7cm', 'soil_moisture_7_to_28cm',
        'soil_moisture_28_to_100cm', 'soil_moisture_100_to_255cm']
START = 1754524800  # 2025-08-07T00:00:00Z
coords = [("Alabama", 32.5, -86.8), ("Alabama", 33.2, -87.5),
          ("Alabama", 34.7, -86.6), ("Alaska", 61.2, -149.9),
          ("Alaska", 64.8, -147.7), ("Alaska", 58.3, -134.4)]
for li, (state, lat, lon) in enumerate(coords):
    nh = 12 if li == 5 else 24  # last location is short
    hourly = {"time": [START + 3600 * h for h in range(nh)]}
    for vi, v in enumerate(VARS):
        vals = [round(math.sin(li + vi * 0.1 + h * 0.2) * 10 + vi, 3)
                for h in range(nh)]
        if li == 2 and vi == 0:
            vals[5] = None  # NaN weather value
        hourly[v] = vals
    w(f"openmeteo/loc{li}.json", json.dumps(
        {"latitude": lat, "longitude": lon, "utc_offset_seconds": 0,
         "hourly": hourly}))
w("openmeteo/coords.csv", "State,Latitude,Longitude\n" +
  "\n".join(f"{s},{a},{o}" for s, a, o in coords) + "\n")

print("fixtures written under", os.path.abspath(BASE))
