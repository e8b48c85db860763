"""BioPAX Level-3 OWL importer (reference ``io/indra.py:141-181``).

The reference's ``from_biopax`` is a thin composition: INDRA's Java-backed
``biopax.process_owl`` turns a BioPAX OWL file into INDRA statements,
which then flow through ``from_indra_statements``. The Java step
(paxtools) is outside this engine's dependency budget, so this module
re-expresses the EXTRACTION SUBSET that INDRA's BioPAX processor mines —
as a pure-stdlib RDF/XML walk — and hands the resulting statement dicts to
the engine's existing INDRA pipeline (``io_indra``), so BioPAX imports get
the same grammar, canonicalization, and edge hashing as everything else.

Extraction subset (the INDRA biopax processor's core patterns):

- ``Catalysis``/``Control`` over a ``BiochemicalReaction`` whose left and
  right sides carry the SAME ``EntityReference`` with a gained (lost)
  ``ModificationFeature`` → a ``Phosphorylation``-family (``De…``)
  statement: enz = controller, sub = the entity, residue/position from
  the modification term + ``SequenceSite``.
- ``Control``/``Catalysis`` with ``controlType`` ACTIVATION/INHIBITION
  whose controlled process shows no modification gain/loss →
  ``Activation``/``Inhibition`` (subject = controller, object = the
  controlled reaction's participants' shared reference, or the
  controller of a controlled Catalysis).
- ``ComplexAssembly`` whose right side is a ``Complex`` → a ``Complex``
  statement over the component agents.

Grounding comes from ``UnificationXref``/``RelationshipXref`` rows on the
``EntityReference`` (db "HGNC Symbol"/"hgnc symbol" → HGNC, "UniProt…" →
UP, "ChEBI" → CHEBI); ``PublicationXref`` rows with db "pubmed" become the
statement's evidence pmids. Anything outside the subset degrades to
nothing (INDRA's own warning: "Not compatible with all BioPAX!").

Distributed shape: one OWL document is one row — ``from_biopax_table``
translates each file inside ``mapInPandas`` and compiles the union, so a
pathway-database dump is an ordinary documents-table job.
"""
import xml.etree.ElementTree as ET

BP = '{http://www.biopax.org/release/biopax-level3.owl#}'
RDF = '{http://www.w3.org/1999/02/22-rdf-syntax-ns#}'

#: modification-term substring → (INDRA statement base type, 1-letter
#: residue or None). Order matters: first hit wins.
_MOD_TERMS = (
    ('phospho-l-serine', 'Phosphorylation', 'S'),
    ('phospho-l-threonine', 'Phosphorylation', 'T'),
    ('phospho-l-tyrosine', 'Phosphorylation', 'Y'),
    ('phospho', 'Phosphorylation', None),
    ('ubiquitin', 'Ubiquitination', None),
    ('acetyl', 'Acetylation', None),
    ('sumo', 'Sumoylation', None),
    ('methyl', 'Methylation', None),
    ('glycosyl', 'Glycosylation', None),
    ('hydroxy', 'Hydroxylation', None),
    ('palmitoyl', 'Palmitoylation', None),
    ('farnesyl', 'Farnesylation', None),
)

#: xref db name (lowered) → INDRA db_refs key
_XREF_DB = {
    'hgnc symbol': 'HGNC', 'hgnc.symbol': 'HGNC', 'hgnc': 'HGNC',
    'uniprot': 'UP', 'uniprot knowledgebase': 'UP', 'uniprotkb': 'UP',
    'chebi': 'CHEBI', 'mesh': 'MESH', 'go': 'GO',
}


def _local_ref(el, prop):
    """rdf:resource='#id' → 'id' (or None); falls back to a nested
    element's rdf:ID."""
    child = el.find(BP + prop)
    if child is None:
        return None
    res = child.get(RDF + 'resource')
    if res:
        return res.lstrip('#')
    for sub in child:
        rid = sub.get(RDF + 'ID') or sub.get(RDF + 'about')
        if rid:
            return rid.lstrip('#')
    return None


def _local_refs(el, prop):
    out = []
    for child in el.findall(BP + prop):
        res = child.get(RDF + 'resource')
        if res:
            out.append(res.lstrip('#'))
            continue
        for sub in child:
            rid = sub.get(RDF + 'ID') or sub.get(RDF + 'about')
            if rid:
                out.append(rid.lstrip('#'))
    return out


def _text(el, prop):
    child = el.find(BP + prop)
    return child.text.strip() if child is not None and child.text else None


class _Model:
    """Id-indexed view over one parsed BioPAX RDF/XML document."""

    def __init__(self, root):
        self.by_id = {}
        for el in root.iter():
            rid = el.get(RDF + 'ID') or el.get(RDF + 'about')
            if rid:
                self.by_id[rid.lstrip('#')] = el

    def get(self, rid):
        return self.by_id.get(rid) if rid else None

    def kind(self, el):
        return el.tag[len(BP):] if el is not None \
            and el.tag.startswith(BP) else None

    # -- entity → agent -------------------------------------------------
    def agent(self, rid):
        """PhysicalEntity id → INDRA Agent dict (or None if ungrounded).
        Complexes recurse into components (bound conditions dropped —
        the INDRA processor keeps the primary member per component)."""
        el = self.get(rid)
        if el is None:
            return None
        name = (_text(el, 'displayName') or _text(el, 'name')
                or _text(el, 'standardName'))
        db_refs = {}
        er = self.get(_local_ref(el, 'entityReference'))
        xref_owner = er if er is not None else el
        er_name = _text(er, 'displayName') if er is not None else None
        for xid in _local_refs(xref_owner, 'xref'):
            x = self.get(xid)
            if x is None or self.kind(x) == 'PublicationXref':
                continue
            db = (_text(x, 'db') or '').lower()
            key = _XREF_DB.get(db)
            if key and key not in db_refs:
                db_refs[key] = _text(x, 'id')
        if not db_refs:
            return None
        # HGNC grounding names the agent by symbol (INDRA convention)
        label = db_refs.get('HGNC') or name or er_name
        return {'name': label, 'db_refs': db_refs}

    def pmids(self, el):
        out = []
        for xid in _local_refs(el, 'xref'):
            x = self.get(xid)
            if x is not None and self.kind(x) == 'PublicationXref' \
                    and (_text(x, 'db') or '').lower() == 'pubmed':
                pmid = _text(x, 'id')
                if pmid:
                    out.append(pmid)
        return out

    # -- modification diffing -------------------------------------------
    def _features(self, rid):
        """PhysicalEntity id → set of (mod_term, position) it carries."""
        el = self.get(rid)
        feats = set()
        if el is None:
            return feats
        for fid in _local_refs(el, 'feature'):
            f = self.get(fid)
            if f is None or self.kind(f) != 'ModificationFeature':
                continue
            mv = self.get(_local_ref(f, 'modificationType'))
            term = (_text(mv, 'term') or '').lower() if mv is not None \
                else ''
            pos = None
            site = self.get(_local_ref(f, 'featureLocation'))
            if site is not None:
                pos = _text(site, 'sequencePosition')
            feats.add((term, pos))
        return feats

    def _entity_ref_of(self, rid):
        el = self.get(rid)
        return _local_ref(el, 'entityReference') if el is not None else None

    def mod_gain(self, reaction):
        """BiochemicalReaction → (sub_rid, mod_term, position, gained)
        for the first left/right pair sharing an EntityReference whose
        feature sets differ by exactly one modification; None otherwise."""
        lefts = _local_refs(reaction, 'left')
        rights = _local_refs(reaction, 'right')
        for l_rid in lefts:
            l_er = self._entity_ref_of(l_rid)
            if l_er is None:
                continue
            for r_rid in rights:
                if self._entity_ref_of(r_rid) != l_er:
                    continue
                lf, rf = self._features(l_rid), self._features(r_rid)
                gained, lost = rf - lf, lf - rf
                if len(gained) == 1 and not lost:
                    term, pos = next(iter(gained))
                    return r_rid, term, pos, True
                if len(lost) == 1 and not gained:
                    term, pos = next(iter(lost))
                    return l_rid, term, pos, False
        return None


def _mod_statement_type(term):
    for needle, stype, residue in _MOD_TERMS:
        if needle in term:
            return stype, residue
    return None, None


def biopax_to_statements(xml_text: str):
    """One BioPAX L3 RDF/XML document → a list of INDRA statement dicts
    (the io_indra input shape). Unsupported constructs are skipped."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    model = _Model(root)
    stmts = []
    for rid, el in model.by_id.items():
        kind = model.kind(el)
        if kind in ('Catalysis', 'Control'):
            controller = model.agent(_local_ref(el, 'controller'))
            controlled_id = _local_ref(el, 'controlled')
            controlled = model.get(controlled_id)
            if controller is None or controlled is None:
                continue
            ctype = (_text(el, 'controlType') or 'ACTIVATION').upper()
            evidence = [{'pmid': p} for p in model.pmids(el)]
            if model.kind(controlled) == 'BiochemicalReaction':
                diff = model.mod_gain(controlled)
                if diff is not None:
                    sub_rid, term, pos, gained = diff
                    stype, residue = _mod_statement_type(term)
                    if stype is None:
                        continue
                    sub = model.agent(sub_rid)
                    if sub is None:
                        continue
                    if not gained:  # lost feature → the De… counterpart
                        stype = 'De' + stype[0].lower() + stype[1:]
                    # the gained feature itself must not sit on the agent
                    sub = dict(sub)
                    sub.pop('mods', None)
                    stmts.append({
                        'type': stype, 'enz': controller, 'sub': sub,
                        'residue': residue, 'position': pos,
                        'evidence': evidence})
                    continue
                # no modification diff → plain activation/inhibition of
                # the reaction's shared participant
                targets = [model.agent(t) for t in
                           _local_refs(controlled, 'right')]
                targets = [t for t in targets if t]
                if not targets:
                    continue
                stmts.append({
                    'type': 'Activation' if ctype != 'INHIBITION'
                    else 'Inhibition',
                    'subj': controller, 'obj': targets[0],
                    'evidence': evidence})
            elif model.kind(controlled) in ('Catalysis', 'Control'):
                # control-of-catalysis: subject regulates the inner enzyme
                inner = model.agent(_local_ref(controlled, 'controller'))
                if inner is None:
                    continue
                stmts.append({
                    'type': 'Activation' if ctype != 'INHIBITION'
                    else 'Inhibition',
                    'subj': controller, 'obj': inner,
                    'obj_activity': 'catalytic',
                    'evidence': evidence})
        elif kind == 'ComplexAssembly':
            for r_rid in _local_refs(el, 'right'):
                cx = model.get(r_rid)
                if model.kind(cx) != 'Complex':
                    continue
                members = [model.agent(c) for c in
                           _local_refs(cx, 'component')]
                members = [m for m in members if m]
                if len(members) >= 2:
                    stmts.append({'type': 'Complex', 'members': members})
    # deterministic order: statement JSON canonical form
    import json
    stmts.sort(key=lambda s: json.dumps(s, sort_keys=True))
    return stmts


def from_biopax(spark, path: str):
    """Driver-side single-file import: BioPAX OWL path → GraphResult via
    the INDRA statement pipeline (reference from_biopax composition)."""
    from .io_indra import from_indra_statements_json

    with open(path, encoding='utf-8') as f:
        xml_text = f.read()
    return from_indra_statements_json(spark, biopax_to_statements(xml_text))


def from_biopax_table(files_df, xml_col='owl_xml'):
    """Distributed path: one OWL document per row → GraphResult. Each
    file's statements become one synthetic BEL document inside
    mapInPandas (same job shape as io_indra.from_indra_statements_jsonl:
    embarrassingly parallel, compile cost scales with unique content)."""
    import pandas as pd

    from .io_indra import _NoResources, statements_to_document
    from .pipeline import build_graph
    from .schemas import DOCUMENTS_SCHEMA

    def translate(batches):
        for pdf in batches:
            texts = [statements_to_document(biopax_to_statements(x))
                     for x in pdf[xml_col]]
            yield pd.DataFrame({
                'url': ['biopax:doc'] * len(texts),
                'warc_ts': [pd.NaT] * len(texts),
                'html': [None] * len(texts),
                'text': texts,
                'lang': [None] * len(texts),
            })

    docs = files_df.select(xml_col).mapInPandas(
        translate, schema=DOCUMENTS_SCHEMA)
    return build_graph(docs, catalog=_NoResources())
