"""Grounding resources: .belns/.belanno parsing and resolution.

The ``.belns``/``.belanno`` formats are INI-style files with a ``[Values]``
section of ``name<delimiter>encoding`` lines (format exemplified by the
reference's fixture files, e.g. testing/resources/belns/test_ns_1.belns).
At cluster scale these become small dimension tables that are broadcast for
the grounding join; here they also feed the in-UDF validation dictionaries.
"""
import os
import re
from urllib.parse import urlparse


def parse_bel_resource(lines):
    """Parse .belns/.belanno lines → {section: dict, 'Values': {name: encoding}}."""
    result = {}
    section = None
    raw_values = []
    for raw in lines:
        line = raw.rstrip('\r\n')
        stripped = line.strip()
        if not stripped or stripped.startswith('#'):
            continue
        m = re.match(r'^\[(.+)\]$', stripped)
        if m:
            section = m.group(1)
            if section != 'Values':
                result.setdefault(section, {})
            continue
        if section is None:
            continue
        if section == 'Values':
            raw_values.append(line)
        elif '=' in line:
            k, v = line.split('=', 1)
            result[section][k.strip()] = v.strip()

    delimiter = result.get('Processing', {}).get('DelimiterString', '|')
    values = {}
    for line in raw_values:
        if delimiter in line:
            name, encoding = line.rsplit(delimiter, 1)
        else:
            name, encoding = line, ''
        name = name.strip()
        if name:
            values[name] = encoding.strip()
    result['Values'] = values
    return result


def read_bel_resource(path):
    with open(path, encoding='utf-8') as f:
        return parse_bel_resource(f)


class ResourceCatalog:
    """Resolves DEFINE NAMESPACE/ANNOTATION ... AS URL references.

    Backed by a set of local directories searched by URL basename — the same
    convention the reference test-suite uses to redirect its fixture URLs to
    local files. Parsed resources are cached (→ loaded once per executor).
    """

    def __init__(self, search_dirs=(), aliases=None):
        self.search_dirs = list(search_dirs)
        self.aliases = aliases or {}
        self._cache = {}

    def _resolve_path(self, url):
        name = url
        if url.startswith('file://'):
            name = url[len('file://'):]
            if os.path.exists(name):
                return name
        else:
            parsed = urlparse(url)
            if parsed.query and 'path=' in parsed.query:
                name = parsed.query.split('=')[-1]
            else:
                name = parsed.path.split('/')[-1]
        name = self.aliases.get(name, name)
        if os.path.exists(name):
            return name
        for d in self.search_dirs:
            candidate = os.path.join(d, os.path.basename(name))
            if os.path.exists(candidate):
                return candidate
        raise FileNotFoundError(url)

    def _load(self, url):
        if url not in self._cache:
            self._cache[url] = read_bel_resource(self._resolve_path(url))
        return self._cache[url]

    def namespace(self, url):
        """{name: encoding} for a namespace URL."""
        return self._load(url)['Values']

    def annotation(self, url):
        """set of valid values for an annotation URL."""
        return set(self._load(url)['Values'])


class DictCatalog:
    """A fully in-memory catalog (what the Spark pipeline broadcasts):
    {url: {name: encoding}} for namespaces, {url: set(values)} for annotations."""

    def __init__(self, namespaces=None, annotations=None):
        self.namespaces_by_url = namespaces or {}
        self.annotations_by_url = annotations or {}

    def namespace(self, url):
        return self.namespaces_by_url[url]

    def annotation(self, url):
        return self.annotations_by_url[url]


#: the reference's own test resource directories — used only to build frozen
#: fixtures and parity tests, never at pipeline runtime
REFERENCE_RESOURCE_DIRS = (
    '/root/reference/src/pybel/testing/resources/belns',
    '/root/reference/src/pybel/testing/resources/belanno',
)

#: URL-basename aliases used by the reference corpus files
#: (reference testing/mocks.py:19-24)
REFERENCE_ALIASES = {
    'go.belns': 'go-names.belns',
    'hgnc-human-genes-20170725.belns': 'hgnc-names.belns',
    'chebi-20170725.belns': 'chebi-names.belns',
    'species-taxonomy-id-20170511.belanno': 'species-taxonomy-id.belanno',
    'confidence-1.0.0.belanno': 'confidence-1.0.0.belanno',
}


def reference_catalog():
    """Catalog over the reference's local fixture resources (tests only)."""
    return ResourceCatalog(search_dirs=REFERENCE_RESOURCE_DIRS,
                           aliases=REFERENCE_ALIASES)
