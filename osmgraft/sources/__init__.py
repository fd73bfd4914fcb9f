"""Format adapters mirroring osmio's OSMReader/OSMWriter surface
(lib.rs:582-659, 709-752): OSM XML, OPL, OSC — each a pair of
DataFrame → lines sink and lines → DataFrame source, with the reference's
golden serialization rules."""
