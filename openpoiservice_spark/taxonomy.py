"""Category taxonomy — 2-level group/category hierarchy keyed by OSM tags.

Plays the role of the reference's `categories.yml` + `CategoryTools`
(reference openpoiservice/server/categories/categories.py:38-73): a static
hierarchy of groups containing leaf categories, each leaf keyed by an OSM
``(tag_key, tag_value)`` pair.  The id scheme matches the reference's
(groups 100..620, leaves 101..627 — ids are *query semantics*: requests
filter by these numbers, reference views.py:108-109), but the table below is
authored here as Python data and intentionally covers the subset of leaves
exercised by the fixtures plus a representative spread per group; deployments
extend ``CATEGORY_TREE`` (it is plain data).

All four in-memory indices the reference builds at startup
(categories.py:38-63) are reproduced: group_index, category_index,
category_ids_index, category_to_group_index.  They are driver-side dicts,
broadcast into pandas UDFs where per-row derivation needs them.
"""

from __future__ import annotations

from functools import lru_cache

# group_name -> (group_id, {tag_key: {tag_value: category_id}})
CATEGORY_TREE: dict[str, tuple[int, dict[str, dict[str, int]]]] = {
    "accomodation": (100, {
        "tourism": {
            "alpine_hut": 101, "apartment": 102, "camp_site": 103,
            "caravan_site": 104, "chalet": 105, "guest_house": 106,
            "hostel": 107, "hotel": 108, "motel": 109, "wilderness_hut": 110,
        },
    }),
    "animals": (120, {
        "amenity": {"animal_boarding": 121, "animal_shelter": 122, "veterinary": 123},
        "shop": {"pet": 124},
    }),
    "arts_and_culture": (130, {
        "amenity": {"arts_centre": 131, "library": 133, "place_of_worship": 135, "studio": 136},
        "tourism": {"gallery": 132, "museum": 134},
    }),
    "education": (150, {
        "amenity": {
            "college": 151, "driving_school": 152, "kindergarten": 153,
            "language_school": 154, "music_school": 155, "school": 156,
            "university": 157,
        },
    }),
    "facilities": (160, {
        "amenity": {
            "compressed_air": 161, "bench": 162, "emergency_phone": 163,
            "clock": 164, "drinking_water": 166, "hunting_stand": 168,
            "internet_cafe": 169, "kneipp_water_cure": 170, "post_box": 171,
            "recycling": 173, "sanitary_dump_station": 175, "shelter": 176,
            "shower": 177, "telephone": 178, "toilets": 179, "waste_basket": 180,
            "waste_disposal": 181, "water_point": 182,
        },
    }),
    "financial": (190, {
        "amenity": {"atm": 191, "bank": 192, "bureau_de_change": 193},
    }),
    "healthcare": (200, {
        "amenity": {
            "baby_hatch": 201, "clinic": 202, "dentist": 203, "doctors": 204,
            "hospital": 206, "nursing_home": 207, "pharmacy": 208,
            "retirement_home": 209, "social_facility": 210,
        },
        "healthcare": {"blood_donation": 211},
        "healthcare:speciality": {"vaccination": 212},
        "vaccination": {"covid19": 213},
    }),
    "historic": (220, {
        "historic": {
            "aircraft": 221, "aqueduct": 222, "archaeological_site": 223,
            "castle": 224, "cannon": 225, "city_gate": 226, "citywalls": 227,
            "battlefield": 228, "boundary_stone": 229, "building": 230,
            "memorial": 237, "monument": 240, "ruins": 243, "tomb": 246,
        },
    }),
    "leisure_and_entertainment": (260, {
        "leisure": {
            "adult_gaming_centre": 261, "amusement_arcade": 262,
            "beach_resort": 263, "bandstand": 264, "dog_park": 268,
            "fitness_centre": 271, "garden": 272, "golf_course": 273,
            "ice_rink": 276, "marina": 277, "park": 280, "pitch": 281,
            "playground": 282, "stadium": 286, "swimming_pool": 288,
        },
        "amenity": {"brothel": 295, "casino": 296, "cinema": 297, "nightclub": 300, "theatre": 304},
    }),
    "natural": (330, {
        "natural": {
            "cave_entrance": 331, "beach": 332, "geyser": 333, "peak": 335,
            "rock": 336, "saddle": 337, "spring": 338, "volcano": 339, "water": 340,
        },
    }),
    "public_places": (360, {
        "amenity": {
            "embassy": 361, "crematorium": 362, "community_centre": 363,
            "courthouse": 364, "fire_station": 367, "grave_yard": 368,
            "police": 369, "post_office": 370, "prison": 371, "townhall": 374,
        },
    }),
    "service": (390, {
        "shop": {
            "beauty": 391, "estate_agent": 392, "dry_cleaning": 393,
            "hairdresser": 395, "laundry": 396, "massage": 397, "tailor": 399,
            "tattoo": 400,
        },
        "amenity": {"photo_booth": 398},
    }),
    "shops": (420, {
        "shop": {
            "agrarian": 421, "alcohol": 422, "antiques": 423, "art": 424,
            "bag": 425, "bakery": 426, "beverages": 428, "bicycle": 429,
            "books": 430, "butcher": 434, "cafe": 435, "camera": 436,
            "car": 438, "chemist": 443, "clothes": 447, "coffee": 448,
            "computer": 449, "convenience": 451, "department_store": 456,
            "electronics": 459, "florist": 465, "furniture": 468,
            "gift": 470, "greengrocer": 471, "hardware": 474,
            "jewelry": 479, "kiosk": 481, "mall": 486, "newsagent": 493,
            "optician": 496, "shoes": 510, "sports": 516, "supermarket": 518,
            "toys": 525,
        },
    }),
    "sustenance": (560, {
        "amenity": {
            "bar": 561, "bbq": 562, "biergarten": 563, "cafe": 564,
            "drinking_water": 565, "fast_food": 566, "food_court": 567,
            "ice_cream": 568, "pub": 569, "restaurant": 570,
        },
    }),
    "transport": (580, {
        "aeroway": {"aerodrome": 581, "helipad": 598, "heliport": 599},
        "amenity": {
            "bicycle_parking": 583, "bicycle_rental": 584, "bus_station": 587,
            "bus_stop": 588, "car_rental": 589, "car_repair": 590,
            "car_sharing": 591, "car_wash": 592, "charging_station": 593,
            "ferry_terminal": 595, "fuel": 596, "motorcycle_parking": 600,
            "parking": 601, "taxi": 606,
        },
        "railway": {"halt": 597, "station": 604, "tram_stop": 605},
        "public_transport": {"platform": 607, "stop_position": 608, "stop_area": 609, "station": 610},
    }),
    "tourism": (620, {
        "tourism": {
            "artwork": 621, "attraction": 622, "information": 624,
            "picnic_site": 625, "viewpoint": 627,
        },
        "amenity": {"fountain": 623},
        "shop": {"travel_agency": 626},
    }),
}

#: tag keys whose values are persisted and surfaced in query output
#: (reference ops_settings.yml:27-47; filter at parse_osm.py:349-351).
TAG_WHITELIST: tuple[str, ...] = (
    "name", "wheelchair", "smoking", "fee", "opening_hours", "phone",
    "website", "healthcare:speciality", "vaccination", "zero_waste",
)


@lru_cache(maxsize=1)
def indices():
    """Build the four lookup indices (reference categories.py:38-63)."""
    group_index: dict[int, list[int]] = {}
    category_index: dict[str, dict[str, int]] = {}
    category_ids_index: dict[int, dict[str, object]] = {}
    category_to_group: dict[int, int] = {}
    for group_name, (group_id, children) in CATEGORY_TREE.items():
        members: list[int] = []
        for tag_key, values in children.items():
            ci = category_index.setdefault(tag_key, {})
            for tag_value, cat_id in values.items():
                ci[tag_value] = cat_id
                members.append(cat_id)
                category_ids_index[cat_id] = {
                    "poi_name": tag_value, "poi_group": group_name,
                }
                category_to_group[cat_id] = group_id
        group_index[group_id] = sorted(members)
    return group_index, category_index, category_ids_index, category_to_group


def categories_of_tags(tags: dict[str, str]) -> list[int]:
    """tag dict -> sorted category ids (reference categories.py:65-73).
    A POI with zero mapped categories is dropped at import
    (reference parse_osm.py:347)."""
    _, category_index, _, _ = indices()
    out = {
        category_index[k][v]
        for k, v in tags.items()
        if k in category_index and v in category_index[k]
    }
    return sorted(out)


def expand_group_ids(group_ids, category_ids) -> list[int]:
    """Union of group members and explicit ids, deduped (reference
    categories.py:21-36, invoked from views.py:108-109)."""
    group_index, _, _, _ = indices()
    out: set[int] = set(category_ids or [])
    for g in group_ids or []:
        if g not in group_index:
            raise ValueError(f"unknown category group id: {g}")
        out.update(group_index[g])
    return sorted(out)


def group_of_category(cat_id: int) -> int | None:
    return indices()[3].get(cat_id)


def category_name(cat_id: int) -> str | None:
    info = indices()[2].get(cat_id)
    return None if info is None else str(info["poi_name"])


def taxonomy_listing() -> dict:
    """The `request=list` payload: the full hierarchy as a JSON-able dict
    (reference views.py:104-106 dumps the parsed YAML verbatim)."""
    out: dict[str, dict] = {}
    for group_name, (group_id, children) in CATEGORY_TREE.items():
        out[group_name] = {
            "id": group_id,
            "children": {k: dict(v) for k, v in children.items()},
        }
    return out
