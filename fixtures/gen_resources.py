"""Freeze the grounding resources used by the synthetic corpus into
fixtures/resources.json: {namespaces: {url: {name: encoding}},
annotations: {url: [values]}}.

Run: python fixtures/gen_resources.py
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pybel_spark.resources import reference_catalog  # noqa: E402

NAMESPACE_URLS = [
    'file://chebi-names.belns',
    'file://hgnc-names.belns',
    'file://go-names.belns',
    'file://mesh-names.belns',
    'file://test_ns_2.belns',
]
ANNOTATION_URLS = [
    'file://species-taxonomy-id.belanno',
    'file://cell-line.belanno',
]


def main():
    catalog = reference_catalog()
    out = {
        'namespaces': {url: catalog.namespace(url) for url in NAMESPACE_URLS},
        'annotations': {url: sorted(catalog.annotation(url)) for url in ANNOTATION_URLS},
    }
    path = os.path.join(HERE, 'resources.json')
    with open(path, 'w') as f:
        json.dump(out, f, sort_keys=True)
    sizes = {u: len(v) for u, v in out['namespaces'].items()}
    print('wrote', path, sizes)


if __name__ == '__main__':
    main()
