"""Recursive-descent BEL statement parser.

A from-scratch, allocation-light reimplementation of the BEL 2.0 term and
relation grammar (reference grammar: src/pybel/parser/parse_bel.py:50-637,
parse_concept.py:27-161, modifiers/*). Designed to run on plain strings inside
Arrow-batched UDFs: no parser-combinator machinery, no per-statement object
construction beyond the output dicts.

The parser returns, per statement, a dict:
  {'type': 'relation'|'term'|'nested'|'list_relation',
   'subject': TermResult, 'relation': str, 'object': TermResult | [TermResult],
   'nested': {...}}
where TermResult = {'node': node-dict, 'modifier': edge-modifier-dict-or-None}.
"""
from .constants import (
    ABUNDANCE, ACTIVITY, ACTIVITY_LABELS, ALL_RELATION_KEYWORDS, AMINO_ACIDS,
    AMINO_ACID_TRIPLES, BEL_DEFAULT_NAMESPACE, BIOPROCESS,
    BEL_TO_BEL_RELATION_KEYWORDS, CAUSAL_POLAR_RELATIONS, CELL_SECRETION,
    CELL_SURFACE, CELL_SURFACE_EXPRESSION, COMPLEX, COMPOSITE, DEGRADATION,
    DIRTY, DNA_NUCLEOTIDES, EXTRACELLULAR, FRAGMENT, FUNCTION_TAGS, GENE,
    GMOD, GMOD_NAMESPACE, HGVS, INTRACELLULAR, MIRNA, MODIFIER_TAGS,
    PATHOLOGY, PMOD, PMOD_LEGACY_LABELS, PMOD_NAMESPACE, POPULATION, PROTEIN,
    REACTION, RELATION_SYMBOLS, RNA, TRANSLOCATION, TRANSCRIBED_TO,
    TRANSLATED_TO, RATE_LIMITING_STEP_OF, SUBPROCESS_OF, BIOMARKER_FOR,
    PROGNOSTIC_BIOMARKER_FOR, HAS_VARIANT, HAS_REACTANT, HAS_PRODUCT,
    BELNS_ENCODINGS,
)
from .exc import (
    BELSyntaxError, InvalidEntity, InvalidFunctionSemantic,
    MalformedTranslocationWarning, MissingNamespaceNameWarning,
    MissingNamespaceRegexWarning, NakedNameWarning, NestedRelationWarning,
    PlaceholderAminoAcidWarning, UndefinedNamespaceWarning,
)
from . import model

_WORD_CHARS = frozenset(
    'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789'
)
_IDENT_CHARS = _WORD_CHARS | {'_'}
_HGVS_CHARS = _WORD_CHARS | set('._*=?>')

SIMPLE_ABUNDANCE_FUNCS = {ABUNDANCE, GENE, RNA, MIRNA, PROTEIN, COMPLEX}
PROCESS_FUNCS = {BIOPROCESS, PATHOLOGY, POPULATION}
TRANSFORMATION_MODIFIERS = {
    TRANSLOCATION, CELL_SECRETION, CELL_SURFACE_EXPRESSION, DEGRADATION,
}


class Scanner:
    """Character scanner with implicit whitespace skipping between tokens."""

    __slots__ = ('text', 'pos', 'n', 'line_number')

    def __init__(self, text, line_number=0):
        self.text = text
        self.pos = 0
        self.n = len(text)
        self.line_number = line_number

    def error(self, message='syntax error'):
        return BELSyntaxError(self.line_number, self.text, self.pos, message)

    # NOTE: whitespace skipping is fused into each method (instead of a
    # shared skip_ws call) — the tokenizer is the hottest code path and
    # Python function-call overhead dominates it.

    def skip_ws(self):
        text, n = self.text, self.n
        i = self.pos
        while i < n and (text[i] == ' ' or text[i] == '\t'):
            i += 1
        self.pos = i

    def eof(self):
        text, n = self.text, self.n
        i = self.pos
        while i < n and (text[i] == ' ' or text[i] == '\t'):
            i += 1
        self.pos = i
        return i >= n

    def peek(self):
        text, n = self.text, self.n
        i = self.pos
        while i < n and (text[i] == ' ' or text[i] == '\t'):
            i += 1
        self.pos = i
        return text[i] if i < n else ''

    def try_char(self, c):
        text, n = self.text, self.n
        i = self.pos
        while i < n and (text[i] == ' ' or text[i] == '\t'):
            i += 1
        if i < n and text[i] == c:
            self.pos = i + 1
            return True
        self.pos = i
        return False

    def expect(self, c):
        if not self.try_char(c):
            raise self.error('expected {!r}'.format(c))

    def read_word(self, charset=_WORD_CHARS):
        """Read a maximal run of charset characters (pyparsing Word)."""
        text, n = self.text, self.n
        i = self.pos
        while i < n and (text[i] == ' ' or text[i] == '\t'):
            i += 1
        start = i
        while i < n and text[i] in charset:
            i += 1
        if i == start:
            self.pos = start
            raise self.error('expected word')
        self.pos = i
        return text[start:i]

    def try_word(self, charset=_WORD_CHARS):
        """read_word without exception overhead on mismatch (hot path)."""
        text, n = self.text, self.n
        i = self.pos
        while i < n and (text[i] == ' ' or text[i] == '\t'):
            i += 1
        start = i
        while i < n and text[i] in charset:
            i += 1
        if i == start:
            return None
        self.pos = i
        return text[start:i]

    def read_quoted(self):
        """Read a double-quoted string; escaped chars kept verbatim
        (pyparsing dblQuotedString + removeQuotes). Scans with str.find
        (C-level) instead of per-char stepping."""
        text, n = self.text, self.n
        i = self.pos
        while i < n and (text[i] == ' ' or text[i] == '\t'):
            i += 1
        if i >= n or text[i] != '"':
            self.pos = i
            raise self.error('expected quoted string')
        k = i + 1
        out = []
        find = text.find
        while True:
            q = find('"', k)
            if q == -1:
                self.pos = i
                raise self.error('unterminated quoted string')
            b = find('\\', k, q)
            if b == -1:
                out.append(text[k:q])
                self.pos = q + 1
                return ''.join(out)
            out.append(text[k:b])
            out.append(text[b:b + 2])  # escape sequence kept verbatim
            k = b + 2

    def read_word_or_quoted(self):
        if self.peek() == '"':
            return self.read_quoted()
        return self.read_word()

    def read_int(self):
        self.skip_ws()
        text, n = self.text, self.n
        i = self.pos
        if i < n and text[i] in '+-':
            i += 1
        j = i
        while j < n and text[j].isdigit():
            j += 1
        if j == i:
            raise self.error('expected integer')
        value = int(self.text[self.pos:j])
        self.pos = j
        return value

    def save(self):
        return self.pos

    def restore(self, pos):
        self.pos = pos


class BELTermParser:
    """Parses BEL terms and statements with namespace validation.

    :param namespaces: {namespace: {name: encoding-string}}
    :param namespace_patterns: {namespace: compiled-regex}
    :param allow_naked_names: accept bare names (namespace → 'dirty')
    :param skip_validation: turn off namespace/semantic validation
    """

    def __init__(
        self,
        namespaces=None,
        namespace_patterns=None,
        allow_naked_names=False,
        skip_validation=False,
        disallow_nested=False,
        disallow_unqualified_translocations=False,
    ):
        self.namespaces = namespaces or {}
        self.namespace_patterns = namespace_patterns or {}
        self.allow_naked_names = allow_naked_names
        self.skip_validation = skip_validation
        self.disallow_nested = disallow_nested
        self.disallow_unqualified_translocations = disallow_unqualified_translocations

    # ------------------------------------------------------------------ #
    # concepts

    def parse_concept(self, s: Scanner, semantic_function=None):
        """Parse ``NS:name``, ``NS:id!name``, or a bare name (parse_concept.py:47-86)."""
        s.skip_ws()
        position = s.pos
        save = s.save()
        namespace = s.try_word()
        if namespace is not None and s.try_char(':'):
            value = s.read_word_or_quoted()
            if s.try_char('!'):
                identifier, name = value, s.read_word_or_quoted()
                concept = {'namespace': namespace, 'name': name, 'identifier': identifier}
            else:
                name = value
                concept = {'namespace': namespace, 'name': name}
            if not self.skip_validation:
                self._validate_concept(s, position, namespace, name)
            return concept
        # bare name
        s.restore(save)
        name = s.read_word_or_quoted()
        if self.skip_validation or self.allow_naked_names:
            return {'namespace': DIRTY, 'name': name}
        raise NakedNameWarning(s.line_number, s.text, position, name)

    def _validate_concept(self, s, position, namespace, name):
        if namespace in self.namespaces:
            if name not in self.namespaces[namespace]:
                raise MissingNamespaceNameWarning(
                    s.line_number, s.text, position, namespace, name)
        elif namespace in self.namespace_patterns:
            if not self.namespace_patterns[namespace].match(name):
                raise MissingNamespaceRegexWarning(
                    s.line_number, s.text, position, namespace, name)
        else:
            raise UndefinedNamespaceWarning(
                s.line_number, s.text, position, namespace, name)

    def check_function_semantics(self, s, position, function, concept):
        """Name's encoding must allow the function (parse_bel.py:686-724)."""
        if self.skip_validation or not self.namespaces or concept is None:
            return
        namespace = concept['namespace']
        if namespace in self.namespace_patterns:
            return
        if self.allow_naked_names and namespace == DIRTY:
            return
        if namespace not in self.namespaces:
            return
        encoding = self.namespaces[namespace].get(concept.get('name'), '')
        valid_functions = set()
        for ch in encoding:
            valid_functions |= BELNS_ENCODINGS.get(ch, set())
        if not valid_functions:
            raise InvalidEntity(
                s.line_number, s.text, position, namespace, concept.get('name'))
        if function not in valid_functions:
            raise InvalidFunctionSemantic(
                s.line_number, s.text, position, function, namespace,
                concept.get('name'), sorted(valid_functions))

    # ------------------------------------------------------------------ #
    # variants

    def _parse_amino_acid(self, s: Scanner):
        position = s.pos
        w = s.read_word()
        if w in AMINO_ACID_TRIPLES:
            return w
        if w in AMINO_ACIDS:
            return AMINO_ACIDS[w]
        if w == 'X':
            raise PlaceholderAminoAcidWarning(s.line_number, s.text, position, w)
        s.restore(position)
        raise s.error('expected amino acid code')

    def parse_variant_element(self, s: Scanner, function):
        """Parse one element of a variant list; dispatch on its tag word."""
        s.skip_ws()
        save = s.save()
        tag = s.try_word()
        if tag is None:
            raise s.error('expected variant')

        if tag in ('var', 'variant'):
            s.expect('(')
            if s.peek() == '"':
                hgvs = s.read_quoted()
            else:
                hgvs = s.read_word(_HGVS_CHARS)
            s.expect(')')
            return {'kind': HGVS, 'hgvs': hgvs}

        if tag in ('pmod', 'proteinModification') and function == PROTEIN:
            return self._parse_pmod(s)

        if tag in ('gmod', 'geneModification') and function == GENE:
            s.expect('(')
            concept = self._parse_mod_concept(s, GMOD_NAMESPACE, None)
            s.expect(')')
            return {'kind': GMOD, 'concept': concept}

        if tag in ('frag', 'fragment') and function == PROTEIN:
            return self._parse_fragment(s)

        if tag in ('sub', 'substitution'):
            if function == PROTEIN:
                return self._parse_psub(s)
            if function == GENE:
                return self._parse_gsub(s)

        if tag in ('trunc', 'truncation') and function == PROTEIN:
            return self._parse_trunc(s)

        s.restore(save)
        raise s.error('invalid variant for {}'.format(function))

    def _parse_mod_concept(self, s: Scanner, default_map, legacy_map):
        """Concept of pmod()/gmod(): qualified concept, default-namespace
        label, or legacy label (modifiers/protein_modification.py:93-127)."""
        s.skip_ws()
        save = s.save()
        word = s.try_word()
        if word is not None and s.peek() == ':':
            s.restore(save)
            position = s.pos
            concept = self.parse_concept(s)  # qualified path with validation
            if concept['namespace'] == DIRTY:
                raise s.error('modification concept must be qualified')
            return concept
        if word is not None:
            if word in default_map:
                return {'namespace': BEL_DEFAULT_NAMESPACE, 'name': default_map[word]}
            if legacy_map and word in legacy_map:
                return {'namespace': BEL_DEFAULT_NAMESPACE, 'name': legacy_map[word]}
        s.restore(save)
        raise s.error('invalid modification label')

    def _parse_pmod(self, s: Scanner):
        s.expect('(')
        concept = self._parse_mod_concept(s, PMOD_NAMESPACE, PMOD_LEGACY_LABELS)
        variant = {'kind': PMOD, 'concept': concept}
        if s.try_char(','):
            variant['code'] = self._parse_amino_acid(s)
            if s.try_char(','):
                variant['position'] = s.read_int()
        s.expect(')')
        return variant

    def _parse_fragment(self, s: Scanner):
        s.expect('(')
        quoted = s.try_char('"')
        variant = {'kind': FRAGMENT}
        if s.peek() == '?':
            s.expect('?')
            variant['missing'] = '?'
        else:
            start = '?' if s.try_char('?') else s.read_int()
            s.expect('_')
            if s.try_char('?'):
                stop = '?'
            elif s.try_char('*'):
                stop = '*'
            else:
                stop = s.read_int()
            variant['start'] = start
            variant['stop'] = stop
        if quoted:
            s.expect('"')
        if s.try_char(','):
            variant['description'] = s.read_quoted()
        s.expect(')')
        return variant

    def _parse_psub(self, s: Scanner):
        s.expect('(')
        ref = self._parse_amino_acid(s)
        s.expect(',')
        pos = s.read_int()
        s.expect(',')
        var = self._parse_amino_acid(s)
        s.expect(')')
        return {'kind': HGVS, 'hgvs': 'p.{}{}{}'.format(ref, pos, var)}

    def _parse_gsub(self, s: Scanner):
        s.expect('(')
        s.skip_ws()
        ref = s.read_word()
        if ref not in DNA_NUCLEOTIDES:
            raise s.error('expected DNA nucleotide')
        s.expect(',')
        pos = s.read_int()
        s.expect(',')
        var = s.read_word()
        if var not in DNA_NUCLEOTIDES:
            raise s.error('expected DNA nucleotide')
        s.expect(')')
        return {'kind': HGVS, 'hgvs': 'c.{}{}>{}'.format(pos, ref, var)}

    def _parse_trunc(self, s: Scanner):
        s.expect('(')
        s.skip_ws()
        save = s.save()
        try:
            aa = self._parse_amino_acid(s)
        except BELSyntaxError:
            s.restore(save)
            pos = s.read_int()
            s.expect(')')
            return {'kind': HGVS, 'hgvs': 'p.{}*'.format(pos)}
        pos = s.read_int()
        s.expect(')')
        return {'kind': HGVS, 'hgvs': 'p.{}{}*'.format(aa, pos)}

    # ------------------------------------------------------------------ #
    # fusions

    def _try_parse_fusion(self, s: Scanner, function):
        """``f(fus(NS:A, "r.1_79", NS:B, "r.312_5034"))`` (modifiers/fusion.py:75-88)."""
        save = s.save()
        tag = s.try_word()
        if tag not in ('fus', 'fusion'):
            s.restore(save)
            return None
        if s.peek() != '(':
            s.restore(save)
            return None
        s.expect('(')
        p5 = {'function': function, 'concept': self.parse_concept(s)}
        s.expect(',')
        r5 = self._parse_fusion_range(s)
        s.expect(',')
        p3 = {'function': function, 'concept': self.parse_concept(s)}
        s.expect(',')
        r3 = self._parse_fusion_range(s)
        s.expect(')')
        return model.make_fusion(function, p5, p3, r5, r3)

    def _parse_fusion_range(self, s: Scanner):
        quoted = s.try_char('"')
        if s.try_char('?'):
            rng = {'missing': '?'}
        else:
            ref = s.read_word()
            if ref not in ('r', 'p', 'c'):
                raise s.error('bad fusion range reference')
            s.expect('.')
            start = '?' if s.try_char('?') else s.read_int()
            s.expect('_')
            stop = '?' if s.try_char('?') else s.read_int()
            rng = {'reference': ref, 'start': start, 'stop': stop}
        if quoted:
            s.expect('"')
        return rng

    def _try_parse_legacy_fusion(self, s: Scanner, function, reference):
        """``f(NS:A, fus(NS:B [, 5', 3']))`` legacy form (fusion.py:91-127)."""
        save = s.save()
        try:
            p5_concept = self.parse_concept(s)
        except Exception:
            s.restore(save)
            return None
        if not s.try_char(','):
            s.restore(save)
            return None
        tag = s.try_word()
        if tag not in ('fus', 'fusion') or s.peek() != '(':
            s.restore(save)
            return None
        s.expect('(')
        p3_concept = self.parse_concept(s)
        r5 = r3 = None
        if s.try_char(','):
            r5 = self._parse_legacy_break(s, reference, start=True)
            s.expect(',')
            r3 = self._parse_legacy_break(s, reference, start=False)
        s.expect(')')
        return model.make_fusion(
            function,
            {'function': function, 'concept': p5_concept},
            {'function': function, 'concept': p3_concept},
            r5, r3,
        )

    @staticmethod
    def _parse_legacy_break(s: Scanner, reference, start):
        if s.try_char('?'):
            return {'missing': '?'}
        value = s.read_int()
        # legacy break-points: 5' side gets (?, value), 3' side (value, ?)
        if start:
            return {'reference': reference, 'start': '?', 'stop': value}
        return {'reference': reference, 'start': value, 'stop': '?'}

    # ------------------------------------------------------------------ #
    # abundances

    def _parse_opt_location(self, s: Scanner):
        """Optional ``, loc(concept)`` suffix (modifiers/location.py)."""
        save = s.save()
        if not s.try_char(','):
            return None
        tag = s.try_word()
        if tag not in ('loc', 'location'):
            s.restore(save)
            return None
        s.expect('(')
        concept = self.parse_concept(s)
        s.expect(')')
        return concept

    _VARIANT_STARTERS = {
        PROTEIN: ('pmod', 'proteinModification', 'var', 'variant', 'frag',
                  'fragment', 'sub', 'substitution', 'trunc', 'truncation'),
        GENE: ('var', 'variant', 'sub', 'substitution', 'gmod', 'geneModification'),
        RNA: ('var', 'variant'),
        MIRNA: ('var', 'variant'),
    }

    def parse_single_abundance(self, s: Scanner, function):
        """Body of ``f(...)`` for a/g/r/m/p after the opening paren."""
        position = s.pos
        location = None

        if function in (GENE, RNA, PROTEIN):
            fusion = self._try_parse_fusion(s, function)
            if fusion is None:
                ref = {GENE: 'c', RNA: 'r', PROTEIN: 'p'}[function]
                fusion = self._try_parse_legacy_fusion(s, function, ref)
            if fusion is not None:
                location = self._parse_opt_location(s)
                return fusion, location

        concept = self.parse_concept(s)
        variants = []
        starters = self._VARIANT_STARTERS.get(function, ())
        while True:
            save = s.save()
            if not s.try_char(','):
                break
            tag = s.try_word()
            if tag in ('loc', 'location') and s.peek() == '(':
                s.restore(save)
                break
            if tag not in starters:
                s.restore(save)
                break
            s.restore(save)
            s.expect(',')
            variants.append(self.parse_variant_element(s, function))
        location = self._parse_opt_location(s)

        if variants:
            node = model.make_central_dogma(function, **_concept_kwargs(concept))
            node['variants'] = sorted(variants, key=model.variant_as_bel)
        else:
            node = {'function': function, 'concept': concept}
        return node, location

    def parse_term(self, s: Scanner, check_semantics=True):
        """Parse a full BEL term → {'node': ..., 'modifier': ..., 'location': ...}.

        The returned 'modifier' is the edge subject/object modifier dict
        (parse_bel.py:891-932); 'location' is folded into it.
        """
        s.skip_ws()
        position = s.pos
        word = s.try_word()
        if word is None:
            raise s.error('expected BEL term')

        if word in MODIFIER_TAGS:
            return self._parse_modifier_term(s, MODIFIER_TAGS[word], position)

        if word in FUNCTION_TAGS:
            return self._parse_function_term(s, FUNCTION_TAGS[word], position,
                                             check_semantics=check_semantics)

        if word in ACTIVITY_LABELS and s.peek() == '(':
            # BEL1 legacy activity: kin(p(X)) → act(p(X), ma(kin)) (parse_bel.py:873-882)
            s.expect('(')
            target = self._parse_simple_abundance_term(s)
            s.expect(')')
            modifier = {
                'modifier': ACTIVITY,
                'effect': {'namespace': BEL_DEFAULT_NAMESPACE,
                           'name': ACTIVITY_LABELS[word]},
            }
            return _with_modifier(target, modifier)

        raise BELSyntaxError(s.line_number, s.text, position,
                             'unknown function {!r}'.format(word))

    def _parse_function_term(self, s: Scanner, function, position, check_semantics=True):
        s.expect('(')

        if function == REACTION:
            node = self._parse_reaction_body(s)
            s.expect(')')
            return {'node': node, 'modifier': None, 'location': None}

        if function == COMPOSITE:
            members = [self._parse_simple_abundance_term(s)['node']]
            while True:
                save = s.save()
                if not s.try_char(','):
                    break
                tag = s.try_word()
                if tag in ('loc', 'location') and s.peek() == '(':
                    s.restore(save)
                    break
                s.restore(save)
                s.expect(',')
                members.append(self._parse_simple_abundance_term(s)['node'])
            location = self._parse_opt_location(s)
            s.expect(')')
            node = model.make_list(COMPOSITE, members)
            return {'node': node, 'modifier': None,
                    'location': location, 'position': position}

        if function in PROCESS_FUNCS:
            concept = self.parse_concept(s)
            s.expect(')')
            if check_semantics:
                self.check_function_semantics(s, position, function, concept)
            node = {'function': function, 'concept': concept}
            return {'node': node, 'modifier': None, 'location': None,
                    'position': position}

        if function == COMPLEX:
            result = self._parse_complex_body(s, position)
            s.expect(')')
            if check_semantics and result['node'].get('members') is None:
                self.check_function_semantics(
                    s, position, COMPLEX, result['node'].get('concept'))
            return result

        if function == ABUNDANCE:
            concept = self.parse_concept(s)
            location = self._parse_opt_location(s)
            s.expect(')')
            if check_semantics:
                self.check_function_semantics(s, position, function, concept)
            node = {'function': function, 'concept': concept}
            return {'node': node, 'modifier': None, 'location': location,
                    'position': position}

        # central dogma: g/r/m/p
        node, location = self.parse_single_abundance(s, function)
        s.expect(')')
        if check_semantics:
            self.check_function_semantics(s, position, function, node.get('concept'))
        return {'node': node, 'modifier': None, 'location': location,
                'position': position}

    def _parse_complex_body(self, s: Scanner, position):
        """complex(concept[, loc]) or complex(member, member...[, loc])."""
        save = s.save()
        word = s.try_word()
        is_member_list = word is not None and s.peek() == '(' and (
            word in FUNCTION_TAGS or word in MODIFIER_TAGS)
        s.restore(save)

        if not is_member_list:
            concept = self.parse_concept(s)
            location = self._parse_opt_location(s)
            node = {'function': COMPLEX, 'concept': concept}
            return {'node': node, 'modifier': None, 'location': location,
                    'position': position}

        members = [self._parse_complex_member(s)]
        while True:
            save = s.save()
            if not s.try_char(','):
                break
            tag = s.try_word()
            if tag in ('loc', 'location') and s.peek() == '(':
                s.restore(save)
                break
            s.restore(save)
            s.expect(',')
            members.append(self._parse_complex_member(s))
        location = self._parse_opt_location(s)
        node = model.make_list(COMPLEX, members)
        return {'node': node, 'modifier': None, 'location': location,
                'position': position}

    def _parse_complex_member(self, s: Scanner):
        """single_abundance | complex_singleton — NOT semantically checked
        (reference applies check_function_semantics only at the
        simple_abundance alternation, parse_bel.py:406-407)."""
        s.skip_ws()
        position = s.pos
        word = s.try_word()
        if word is None or word not in FUNCTION_TAGS:
            raise s.error('expected abundance inside complex')
        function = FUNCTION_TAGS[word]
        if function not in SIMPLE_ABUNDANCE_FUNCS:
            raise s.error('invalid complex member function')
        s.expect('(')
        if function == COMPLEX:
            concept = self.parse_concept(s)
            self._parse_opt_location(s)
            s.expect(')')
            return {'function': COMPLEX, 'concept': concept}
        if function == ABUNDANCE:
            concept = self.parse_concept(s)
            self._parse_opt_location(s)
            s.expect(')')
            return {'function': ABUNDANCE, 'concept': concept}
        node, _location = self.parse_single_abundance(s, function)
        s.expect(')')
        return node

    def _parse_simple_abundance_term(self, s: Scanner):
        """simple_abundance = complex_abundances | single_abundance, with
        semantic checking (parse_bel.py:406-407)."""
        s.skip_ws()
        position = s.pos
        word = s.try_word()
        if word is None or word not in FUNCTION_TAGS:
            raise s.error('expected simple abundance')
        function = FUNCTION_TAGS[word]
        if function not in SIMPLE_ABUNDANCE_FUNCS:
            raise BELSyntaxError(s.line_number, s.text, position,
                                 'expected simple abundance')
        return self._parse_function_term(s, function, position)

    def _parse_reaction_body(self, s: Scanner):
        for kw in ('reactants',):
            got = s.try_word()
            if got != kw:
                raise s.error('expected reactants(...)')
        s.expect('(')
        reactants = [self._parse_simple_abundance_term(s)['node']]
        while s.try_char(','):
            reactants.append(self._parse_simple_abundance_term(s)['node'])
        s.expect(')')
        s.expect(',')
        got = s.try_word()
        if got != 'products':
            raise s.error('expected products(...)')
        s.expect('(')
        products = [self._parse_simple_abundance_term(s)['node']]
        while s.try_char(','):
            products.append(self._parse_simple_abundance_term(s)['node'])
        s.expect(')')
        return model.make_reaction(reactants, products)

    # ------------------------------------------------------------------ #
    # modifier terms (act/tloc/sec/surf/deg)

    def _parse_modifier_term(self, s: Scanner, modifier, position):
        s.expect('(')

        if modifier == ACTIVITY:
            target = self._parse_simple_abundance_term(s)
            effect = None
            if s.try_char(','):
                effect = self._parse_molecular_activity(s)
            s.expect(')')
            mod = {'modifier': ACTIVITY}
            if effect is not None:
                mod['effect'] = effect
            return _with_modifier(target, mod)

        if modifier == DEGRADATION:
            target = self._parse_simple_abundance_term(s)
            s.expect(')')
            return _with_modifier(target, {'modifier': DEGRADATION})

        if modifier == CELL_SECRETION:
            target = self._parse_simple_abundance_term(s)
            s.expect(')')
            return _with_modifier(target, _translocation_modifier(
                {'namespace': BEL_DEFAULT_NAMESPACE, 'name': INTRACELLULAR},
                {'namespace': BEL_DEFAULT_NAMESPACE, 'name': EXTRACELLULAR},
            ))

        if modifier == CELL_SURFACE_EXPRESSION:
            target = self._parse_simple_abundance_term(s)
            s.expect(')')
            return _with_modifier(target, _translocation_modifier(
                {'namespace': BEL_DEFAULT_NAMESPACE, 'name': INTRACELLULAR},
                {'namespace': BEL_DEFAULT_NAMESPACE, 'name': CELL_SURFACE},
            ))

        if modifier == TRANSLOCATION:
            target = self._parse_simple_abundance_term(s)
            if not s.try_char(','):
                s.expect(')')
                if self.disallow_unqualified_translocations:
                    raise MalformedTranslocationWarning(
                        s.line_number, s.text, position, 'unqualified translocation')
                return _with_modifier(target, {'modifier': TRANSLOCATION})
            save = s.save()
            tag = s.try_word()
            if tag == 'fromLoc':
                s.expect('(')
                from_loc = self.parse_concept(s)
                s.expect(')')
                s.expect(',')
                got = s.try_word()
                if got != 'toLoc':
                    raise s.error('expected toLoc(...)')
                s.expect('(')
                to_loc = self.parse_concept(s)
                s.expect(')')
            else:
                s.restore(save)
                from_loc = self.parse_concept(s)
                s.expect(',')
                to_loc = self.parse_concept(s)
            s.expect(')')
            return _with_modifier(target, _translocation_modifier(from_loc, to_loc))

        raise s.error('unknown modifier')

    def _parse_molecular_activity(self, s: Scanner):
        """``ma(...)`` → effect concept (parse_bel.py:419-426)."""
        tag = s.try_word()
        if tag not in ('ma', 'molecularActivity'):
            raise s.error('expected ma(...)')
        s.expect('(')
        save = s.save()
        word = s.try_word()
        if word is not None and word in ACTIVITY_LABELS and s.peek() == ')':
            effect = {'namespace': BEL_DEFAULT_NAMESPACE,
                      'name': ACTIVITY_LABELS[word]}
        else:
            s.restore(save)
            effect = self.parse_concept(s)
        s.expect(')')
        return effect

    # ------------------------------------------------------------------ #
    # statements

    def parse_relation_token(self, s: Scanner):
        s.skip_ws()
        position = s.pos
        text = s.text
        for sym in RELATION_SYMBOLS:
            if text.startswith(sym, position):
                s.pos = position + len(sym)
                return ALL_RELATION_KEYWORDS[sym], position
        word = s.try_word(_IDENT_CHARS)
        if word is not None and word in ALL_RELATION_KEYWORDS:
            return ALL_RELATION_KEYWORDS[word], position
        raise BELSyntaxError(s.line_number, text, position, 'expected relation')

    def parse_statement(self, line, line_number=0):
        """Parse one statement line → a statement dict (see module docstring)."""
        s = Scanner(line, line_number)
        subject = self.parse_term(s)

        if s.eof():
            return {'type': 'term', 'subject': subject}

        relation, rel_position = self.parse_relation_token(s)

        if relation in ('hasMembers', 'hasComponents'):
            got = s.try_word()
            if got != 'list':
                raise s.error('expected list(...)')
            s.expect('(')
            children = [self.parse_term(s)]
            while s.try_char(','):
                children.append(self.parse_term(s))
            s.expect(')')
            # trailing content after a full relation match is ignored
            # (the reference grammar has no StringEnd on relations)
            self._require_plain_abundance(s, rel_position, subject)
            for child in children:
                self._require_plain_abundance(s, rel_position, child)
            return {'type': 'list_relation', 'subject': subject,
                    'relation': relation, 'children': children}

        if relation in CAUSAL_POLAR_RELATIONS and s.peek() == '(':
            # nested statement: a -> (b -> c) (parse_bel.py:606-620)
            s.expect('(')
            inner_subject = self.parse_term(s)
            inner_relation, _ = self.parse_relation_token(s)
            if inner_relation not in CAUSAL_POLAR_RELATIONS:
                raise s.error('nested relation must be causal')
            inner_object = self.parse_term(s)
            s.expect(')')
            if self.disallow_nested:
                # the reference's handler fires AFTER the whole nested match,
                # so inner-term warnings win over NestedRelationWarning
                raise NestedRelationWarning(s.line_number, line, s.pos)
            return {
                'type': 'nested', 'subject': subject, 'relation': relation,
                'object': {'type': 'relation', 'subject': inner_subject,
                           'relation': inner_relation, 'object': inner_object},
            }

        obj = self.parse_term(s)
        self._check_relation_types(s, rel_position, relation, subject, obj)
        return {'type': 'relation', 'subject': subject,
                'relation': relation, 'object': obj}

    @staticmethod
    def _require_plain_abundance(s, position, term):
        if term['modifier'] is not None or term['node']['function'] == REACTION:
            raise BELSyntaxError(s.line_number, s.text, position,
                                 'expected an abundance term')

    def _check_relation_types(self, s, position, relation, subject, obj):
        """Enforce the reference grammar's per-relation term-type constraints
        (parse_bel.py:530-604)."""
        def err():
            return BELSyntaxError(s.line_number, s.text, position,
                                  'invalid term types for ' + relation)

        subj_mod = (subject['modifier'] or {}).get('modifier')
        obj_mod = (obj['modifier'] or {}).get('modifier')
        subj_fn = subject['node']['function']
        obj_fn = obj['node']['function']

        if relation in BEL_TO_BEL_RELATION_KEYWORDS.values():
            return  # any bel_term on both sides

        if relation == TRANSCRIBED_TO:
            if subj_mod or obj_mod or subj_fn != GENE or obj_fn != RNA:
                raise err()
        elif relation == TRANSLATED_TO:
            if subj_mod or obj_mod or subj_fn != RNA or obj_fn != PROTEIN:
                raise err()
        elif relation == RATE_LIMITING_STEP_OF:
            subj_ok = (
                (subj_mod is None and subj_fn == BIOPROCESS)
                or subj_mod == ACTIVITY
                or subj_mod in TRANSFORMATION_MODIFIERS
                or subj_fn == REACTION
            )
            if not subj_ok or obj_mod or obj_fn != BIOPROCESS:
                raise err()
        elif relation == SUBPROCESS_OF:
            subj_ok = (
                (subj_mod is None and subj_fn in PROCESS_FUNCS)
                or subj_mod == ACTIVITY
                or subj_mod in TRANSFORMATION_MODIFIERS
                or subj_fn == REACTION
            )
            obj_ok = (obj_mod is None and obj_fn in PROCESS_FUNCS) or obj_mod == ACTIVITY
            if not subj_ok or not obj_ok:
                raise err()
        elif relation in (BIOMARKER_FOR, PROGNOSTIC_BIOMARKER_FOR):
            obj_ok = (obj_mod is None and obj_fn in PROCESS_FUNCS) or obj_mod == ACTIVITY
            if not obj_ok:
                raise err()
        elif relation in ('hasMember', 'hasComponent'):
            self._require_plain_abundance(s, position, subject)
            self._require_plain_abundance(s, position, obj)
        elif relation == HAS_VARIANT:
            self._require_plain_abundance(s, position, subject)
            self._require_plain_abundance(s, position, obj)
        elif relation in (HAS_REACTANT, HAS_PRODUCT):
            if subj_fn != REACTION:
                raise err()
            self._require_plain_abundance(s, position, obj)


def _concept_kwargs(concept):
    return {
        'namespace': concept['namespace'],
        'name': concept.get('name'),
        'identifier': concept.get('identifier'),
    }


def _translocation_modifier(from_loc, to_loc):
    return {
        'modifier': TRANSLOCATION,
        'effect': {'from_loc': from_loc, 'to_loc': to_loc},
    }


def _with_modifier(target, modifier):
    """Fold a modifier over a parsed target term (modifier_po_to_dict,
    parse_bel.py:891-932): target location is lifted onto the modifier."""
    if target.get('location') is not None:
        modifier = dict(modifier)
        modifier['location'] = target['location']
    return {'node': target['node'], 'modifier': modifier, 'location': None}
