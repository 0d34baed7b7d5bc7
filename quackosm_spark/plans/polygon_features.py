"""OSM way→polygon decision table (data, not code).

Which closed ways render as areas: keys in ALL always imply an area; ALLOWLIST
keys imply an area only for the listed values; DENYLIST keys imply an area for
every value EXCEPT the listed ones. Sourced from the public datasets
https://github.com/tyrasd/osm-polygon-features (v0.9.2) and
https://github.com/ideditor/id-area-keys (v5.0.1) — the same upstreams the
reference documents for its config (reference pbf_file_reader.py:292-297).
Used by the C8 polygonization decision (SURVEY §2.9).
"""

OSM_WAY_POLYGON_FEATURES_CONFIG = {'all': ['allotments', 'area:highway', 'boundary', 'bridge:support', 'building', 'building:part', 'cemetery', 'club', 'craft', 'demolished:building', 'disused:amenity', 'disused:leisure', 'disused:shop', 'healthcare', 'historic', 'industrial', 'internet_access', 'junction', 'landuse', 'leisure', 'office', 'place', 'police', 'polling_station', 'public_transport', 'residential', 'ruins', 'seamark:type', 'shop', 'sport', 'telecom', 'tourism'],
    'allowlist': {'advertising': ['sculpture', 'sign'],
    'aerialway': ['station'],
    'barrier': ['city_wall', 'hedge', 'toll_booth', 'wall'],
    'highway': ['platform', 'rest_area', 'services'],
    'railway': ['platform', 'roundhouse', 'station', 'turntable'],
    'waterway': ['boatyard', 'dam', 'dock', 'fuel', 'riverbank']}, 'denylist': {'aeroway': ['jet_bridge', 'no', 'parking_position', 'taxiway'],
    'amenity': ['bench', 'weighbridge'],
    'attraction': ['boat_ride', 'river_rafting', 'train', 'water_slide'],
    'emergency': ['designated', 'destination', 'no', 'official', 'private', 'yes'],
    'geological': ['fault', 'volcanic_caldera_rim'],
    'golf': ['cartpath', 'hole', 'path'],
    'indoor': ['corridor', 'wall'],
    'man_made': ['breakwater', 'carpet_hanger', 'crane', 'cutline', 'dyke', 'embankment', 'goods_conveyor', 'groyne', 'pier', 'pipeline', 'torii', 'video_wall', 'yes'],
    'military': ['trench'],
    'natural': ['arete', 'bay', 'cliff', 'coastline', 'no', 'ridge', 'strait', 'tree_row', 'valley'],
    'piste:type': ['downhill', 'hike', 'ice_skate', 'nordic', 'skitour', 'sled', 'sleigh'],
    'playground': ['balancebeam', 'climbing_slope', 'rope_swing', 'rope_traverse', 'stepping_post', 'stepping_stone'],
    'power': ['bay', 'busbar', 'cable', 'insulator', 'line', 'minor_line', 'portal']}}
