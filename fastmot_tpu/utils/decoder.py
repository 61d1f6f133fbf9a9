"""JSON config decoder (behavioral reference: utils/decoder.py):
converts JSON arrays to tuples so configs can be splatted as kwargs with
hashable defaults."""
import json


class ConfigDecoder(json.JSONDecoder):
    def __init__(self, **kwargs):
        json.JSONDecoder.__init__(self, **kwargs)
        self.parse_array = self._parse_array
        self.scan_once = json.scanner.py_make_scanner(self)

    def _parse_array(self, *args, **kwargs):
        values, end = json.decoder.JSONArray(*args, **kwargs)
        return tuple(values), end
