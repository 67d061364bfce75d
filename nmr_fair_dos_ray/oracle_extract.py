"""DuckDB oracle SQL for the extraction pipeline contract queries.

Independent SQL reimplementation of the M1-M11 mapper semantics over the
FROZEN envelope spec in sources/envelopes.py (doc_id-modulus branches). The
Ray side synthesizes real nested JSON and runs the generic extractors
(parse → dispatch → map); the SQL predicts the expected long-format output
directly from doc_id — any divergence in a mapper branch, guard, date
cascade, license rule or dedup shows up as a value-hash mismatch.
"""

# Shared derived-scalar CTE: one row per VALID envelope (d%17!=0 dead-letters)
_BASE = """
WITH base AS (
  SELECT doc_id AS d,
         '10.80/nmr.' || doc_id AS doi,
         base64(encode('10.80/nmr.' || doc_id)) AS pid,
         'nmr record ' || doc_id AS nm,
         doc_id % 3 AS kind,
         (doc_id // 3) % 3 AS sub,
         TIMESTAMP '2024-01-01' + to_minutes(7 * doc_id) AS cts,
         TIMESTAMP '2024-01-01' + to_minutes(7 * doc_id) + INTERVAL 1 DAY AS mts
  FROM documents
  WHERE doc_id % 17 != 0
), b AS (
  SELECT *,
    CASE WHEN d % 4 IN (2, 3)
         THEN strftime(date_trunc('day', cts), '%Y-%m-%dT%H:%M:%S')
         ELSE strftime(cts, '%Y-%m-%dT%H:%M:%S') END AS iso_c,
    CASE WHEN (d + 1) % 4 IN (2, 3)
         THEN strftime(date_trunc('day', mts), '%Y-%m-%dT%H:%M:%S')
         ELSE strftime(mts, '%Y-%m-%dT%H:%M:%S') END AS iso_m,
    strftime(cts, '%Y-%m-%dT%H:%M:%S') AS iso_c_full,
    CASE d % 5 WHEN 0 THEN 'https://spdx.org/licenses/MIT.json'
               WHEN 1 THEN 'https://spdx.org/licenses/CC-BY-4.0.json'
               WHEN 2 THEN 'https://spdx.org/licenses/CC-BY-SA-4.0.json'
               WHEN 3 THEN 'https://spdx.org/licenses/Apache-2.0.json'
               ELSE 'not-a-license' END AS lic,
    '"21.T11969/6c4d3deac9a49b65886a":' || ((d % 90) + 1) || '.0' AS mwkv,
    '"21.T11969/f9cb9b53273ce0da7739":"https://pubchem.example/c' || d || '"' AS urlkv,
    d % 5 != 0 AS has_c,
    d % 2 = 0 AS has_m,
    base64(encode('https://chemotion.example')) AS chem_fdo,
    base64(encode('https://nmrxiv.example')) AS nmr_fdo
  FROM base
)
"""

# compound value_json for the {mw iff d%2=1, url iff d%4<2} pattern
_COMPOUND = (
    "CASE WHEN d % 4 = 1 THEN '{' || mwkv || ',' || urlkv || '}'"
    "     WHEN d % 2 = 1 THEN '{' || mwkv || '}'"
    "     WHEN d % 4 < 2 THEN '{' || urlkv || '}'"
    "     ELSE NULL END"
)

ENTRIES_SQL = _BASE + f"""
SELECT pid, key, name, value_json FROM (
  -- ---- generic: every valid record --------------------------------------
  SELECT pid, '21.T11148/076759916209e5d62bd5' AS key,
         'Kernel Information Profile' AS name,
         '21.T11148/b9b76f887845e32d29f7' AS value_json FROM b
  UNION ALL
  SELECT pid, '21.T11148/1c699a5d1b4ad3ba4956', 'digitalObjectType',
         '21.T11148/ca9fd0b2414177b79ac2' FROM b
  UNION ALL
  SELECT pid, '21.T11148/a753134738da82809fc1', 'hadPrimarySource',
         CASE WHEN kind < 2 THEN chem_fdo ELSE nmr_fdo END FROM b
  UNION ALL  -- digitalObjectLocation
  SELECT pid, '21.T11148/b8457812905b83046284', 'digitalObjectLocation',
         CASE WHEN kind < 2 THEN 'https://dx.doi.org/' || doi
              WHEN d % 6 < 3 THEN 'https://nmrxiv.example/dl/' || d
              ELSE 'https://dx.doi.org/' || doi END FROM b
  UNION ALL  -- dateModified
  SELECT pid, '21.T11148/397d831aa3a9d18eb52c', 'dateModified', iso_m
  FROM b WHERE has_m
  UNION ALL  -- dateCreated: own, else Chemotion-dataset parent fallback
  SELECT pid, '21.T11148/aafd5fb4c7222e2d950a', 'dateCreated',
         CASE WHEN has_c THEN iso_c ELSE iso_c_full END
  FROM b WHERE has_c OR (kind = 0 AND d % 10 IN (0, 5))
  UNION ALL  -- resourceType
  SELECT pid, '21.T11969/b736c3898dd1f6603e2c', 'resourceType',
         CASE WHEN kind = 0 THEN 'Dataset'
              WHEN kind = 1 THEN 'Study'
              WHEN sub = 0 THEN 'Dataset'
              WHEN sub = 1 THEN 'Study'
              ELSE 'Project' END FROM b
  UNION ALL  -- license (chemotion always; nmrxiv spdx_id else bioschema CC-BY)
  SELECT pid, '21.T11148/2f314c8fe5fb6a0063a8', 'license',
         CASE WHEN kind = 2 AND d % 4 = 3
              THEN 'https://spdx.org/licenses/CC-BY-4.0.json'
              ELSE lic END FROM b
  -- ---- contacts ----------------------------------------------------------
  UNION ALL  -- chemotion orcid contacts
  SELECT pid, '21.T11148/1a73af9e7ae00182733b', 'contact',
         'https://orcid.org/' ||
         CASE WHEN d % 4 = 0 THEN '0000-C' || d ELSE '0000-A' || d END
  FROM b WHERE kind < 2
  UNION ALL  -- chemotion second contact (d%4=3)
  SELECT pid, '21.T11148/1a73af9e7ae00182733b', 'contact',
         'https://orcid.org/0000-B' || d
  FROM b WHERE kind < 2 AND d % 4 = 3
  UNION ALL  -- nmrxiv orcid contact
  SELECT pid, '21.T11148/1a73af9e7ae00182733b', 'contact',
         'https://orcid.org/0000-N' || d
  FROM b WHERE kind = 2 AND d % 4 < 2 AND d % 2 = 0
  UNION ALL  -- nmrxiv author email
  SELECT pid, '21.T11148/e117a4a29bfd07438c1e', 'emailContact', 'u' || d || '@x.org'
  FROM b WHERE kind = 2 AND d % 4 < 2 AND d % 2 = 1
  UNION ALL  -- nmrxiv owner email fallback
  SELECT pid, '21.T11148/e117a4a29bfd07438c1e', 'emailContact', 'o' || d || '@x.org'
  FROM b WHERE kind = 2 AND d % 4 >= 2
  -- ---- name / landing page / identifier ----------------------------------
  UNION ALL
  SELECT pid, '21.T11148/6ae999552a0d2dca14d6',
         CASE WHEN kind = 2 AND sub = 0 AND d % 8 != 5 THEN NULL ELSE 'name' END,
         CASE WHEN kind = 0 THEN nm
              WHEN kind = 1 THEN 'about ' || d
              WHEN sub = 0 AND d % 8 = 5 THEN nm || '-C6H6'
              WHEN sub = 0 THEN nm || '-part' || d
              ELSE nm END FROM b
  UNION ALL
  SELECT pid, '21.T11969/8710d753ad10f371189b', 'landingPageLocation',
         CASE WHEN kind = 0 THEN 'https://chemotion.example/ds/' || d
              WHEN kind = 1 THEN 'https://chemotion.example/study/' || d
              WHEN d % 4 < 2 THEN 'https://nmrxiv.example/r/' || d
              ELSE 'https://nmrxiv.example/b/' || d END FROM b
  UNION ALL
  SELECT pid, '21.T11148/f3f0cbaa39fa9966b279', 'identifier',
         CASE WHEN kind = 0 THEN 'CHEM:D' || d
              WHEN kind = 1 THEN 'CHEM:S' || d
              ELSE doi END FROM b
  -- ---- NMR method ---------------------------------------------------------
  UNION ALL
  SELECT pid, '21.T11969/7a19f6d5c8e63dd6bfcb', 'NMR method',
         'https://chem.example/method/nmr'
  FROM b WHERE kind = 0 AND d % 7 = 0
  UNION ALL
  SELECT pid, '21.T11969/7a19f6d5c8e63dd6bfcb', 'NMR method',
         'https://nmr.example/method/m' || (d % 3)
  FROM b WHERE kind = 2 AND sub = 0 AND d % 2 = 0
  -- ---- previews -----------------------------------------------------------
  UNION ALL
  SELECT pid, '21.T11148/7fdada5846281ef5d461', 'locationPreview',
         'https://img.example/' || d || '.png'
  FROM b WHERE kind = 1 AND d % 6 = 1
  UNION ALL
  SELECT pid, '21.T11148/7fdada5846281ef5d461', 'locationPreview',
         'https://img.example/d' || d || '.png'
  FROM b WHERE kind = 2 AND sub = 0 AND d % 6 = 0
  UNION ALL
  SELECT pid, '21.T11148/7fdada5846281ef5d461', 'locationPreview',
         'https://img.example/s' || d || 'a.png'
  FROM b WHERE kind = 2 AND sub = 1
  UNION ALL
  SELECT pid, '21.T11148/7fdada5846281ef5d461', 'locationPreview',
         'https://img.example/s' || d || 'b.png'
  FROM b WHERE kind = 2 AND sub = 1 AND d % 2 = 0
  UNION ALL
  SELECT pid, '21.T11148/7fdada5846281ef5d461', 'locationPreview',
         'https://img.example/p' || d || '.png'
  FROM b WHERE kind = 2 AND sub = 2 AND d % 6 = 0
  -- ---- characterizedCompound ---------------------------------------------
  UNION ALL  -- chemotion study about-part
  SELECT pid, '21.T11969/d15381199a44a16dc88d', 'characterizedCompound',
         {_COMPOUND}
  FROM b WHERE kind = 1 AND (d % 2 = 1 OR d % 4 < 2)
  UNION ALL  -- nmrxiv dataset isPartOf biochem part
  SELECT pid, '21.T11969/d15381199a44a16dc88d', 'characterizedCompound',
         {_COMPOUND}
  FROM b WHERE kind = 2 AND sub = 0 AND (d % 2 = 1 OR d % 4 < 2)
  UNION ALL  -- nmrxiv sample: about part (odd d) or molecules fallback (d%8=2)
  SELECT pid, '21.T11969/d15381199a44a16dc88d', 'characterizedCompound',
         CASE WHEN d % 4 = 1 THEN '{{' || mwkv || ',' || urlkv || '}}'
              WHEN d % 2 = 1 THEN '{{' || mwkv || '}}'
              ELSE '{{' || mwkv || '}}' END
  FROM b WHERE kind = 2 AND sub = 1 AND (d % 2 = 1 OR d % 8 = 2)
  -- ---- terminology entries (nmrxiv dataset) ------------------------------
  UNION ALL
  SELECT pid, '21.T11969/92b4c6b461709b5b36f5', 'NMR solvent',
         CASE d % 4
              WHEN 0 THEN 'http://purl.obolibrary.org/obo/CHEBI_85365'
              WHEN 1 THEN 'http://purl.obolibrary.org/obo/CHEBI_91502'
              ELSE 'http://purl.obolibrary.org/obo/CHEBI_41981' END
  FROM b WHERE kind = 2 AND sub = 0 AND d % 4 < 3
  UNION ALL
  SELECT pid, '21.T11969/1058eae15dac10260bb6', 'Aquisition Nucleus',
         CASE (d // 2) % 2
              WHEN 0 THEN 'http://purl.obolibrary.org/obo/CHEBI_49637'
              ELSE 'http://purl.obolibrary.org/obo/CHEBI_36928' END
  FROM b WHERE kind = 2 AND sub = 0 AND d % 2 = 0
  UNION ALL
  SELECT pid, '21.T11969/1e6e84562ace3b58558d', 'Nominal Proton Frequency',
         (300 + (d % 8) * 100) || ' MHz'
  FROM b WHERE kind = 2 AND sub = 0 AND d % 5 < 3
  UNION ALL
  SELECT pid, '21.T11969/3303cd9e3dda7afd6000', 'Pulse Sequence Name', 'zg30'
  FROM b WHERE kind = 2 AND sub = 0 AND d % 5 = 2
)
ORDER BY pid, key, value_json
"""

EDGES_SQL = _BASE + f"""
SELECT pid, presumed_target, key, name, value_json FROM (
  -- chemotion study -> subjectOf dataset (d-1)
  SELECT pid, base64(encode('10.80/nmr.' || (d - 1))) AS presumed_target,
         '21.T11148/d0773859091aeb451528' AS key, 'hasMetadata' AS name,
         pid AS value_json
  FROM b WHERE kind = 1 AND d % 5 < 4
  UNION ALL
  SELECT pid, base64(encode('10.80/nmr.' || (d - 1))),
         '21.T11148/7fdada5846281ef5d461', 'locationPreview',
         'https://img.example/' || d || '.png'
  FROM b WHERE kind = 1 AND d % 5 < 4 AND d % 6 = 1
  UNION ALL
  SELECT pid, base64(encode('10.80/nmr.' || (d - 1))),
         '21.T11969/d15381199a44a16dc88d', 'characterizedCompound',
         {_COMPOUND}
  FROM b WHERE kind = 1 AND d % 5 < 4 AND (d % 2 = 1 OR d % 4 < 2)
  -- nmrxiv sample -> hasPart dataset (d-2)
  UNION ALL
  SELECT pid, base64(encode('10.80/nmr.' || (d - 2))),
         '21.T11148/d0773859091aeb451528', 'hasMetadata', pid
  FROM b WHERE kind = 2 AND sub = 1 AND d >= 2
  UNION ALL
  SELECT pid, base64(encode('10.80/nmr.' || (d - 2))),
         '21.T11148/7fdada5846281ef5d461', 'locationPreview',
         'https://img.example/s' || d || 'a.png'
  FROM b WHERE kind = 2 AND sub = 1 AND d >= 2
  UNION ALL
  SELECT pid, base64(encode('10.80/nmr.' || (d - 2))),
         '21.T11148/7fdada5846281ef5d461', 'locationPreview',
         'https://img.example/s' || d || 'b.png'
  FROM b WHERE kind = 2 AND sub = 1 AND d >= 2 AND d % 2 = 0
  UNION ALL
  SELECT pid, base64(encode('10.80/nmr.' || (d - 2))),
         '21.T11969/d15381199a44a16dc88d', 'characterizedCompound',
         CASE WHEN d % 4 = 1 THEN '{{' || mwkv || ',' || urlkv || '}}'
              ELSE '{{' || mwkv || '}}' END
  FROM b WHERE kind = 2 AND sub = 1 AND d >= 2 AND (d % 2 = 1 OR d % 8 = 2)
  -- nmrxiv project -> hasPart study (d-1)
  UNION ALL
  SELECT pid, base64(encode('10.80/nmr.' || (d - 1))),
         '21.T11148/d0773859091aeb451528', 'hasMetadata', pid
  FROM b WHERE kind = 2 AND sub = 2 AND d >= 1
)
ORDER BY pid, presumed_target, key, value_json
"""

ERRORS_SQL = """
SELECT CASE WHEN doc_id % 3 < 2 THEN 'chemotion' ELSE 'nmrxiv' END AS repo,
       count(*) AS n_errors
FROM documents WHERE doc_id % 17 = 0
GROUP BY repo ORDER BY repo
"""

# resolution: probe-1 pid hit iff the target doc's envelope was valid
# (d%17!=0 — targets are always in-range by construction); probe-2 never
# fires because presumed targets are base64 PIDs, not location URLs
RESOLVED_SQL = _BASE + """
, edges AS (
  SELECT name AS relation, tgt FROM (
    SELECT 'hasMetadata' AS name, d - 1 AS tgt FROM b WHERE kind = 1 AND d % 5 < 4
    UNION ALL
    SELECT 'locationPreview', d - 1 FROM b WHERE kind = 1 AND d % 5 < 4 AND d % 6 = 1
    UNION ALL
    SELECT 'characterizedCompound', d - 1
    FROM b WHERE kind = 1 AND d % 5 < 4 AND (d % 2 = 1 OR d % 4 < 2)
    UNION ALL
    SELECT 'hasMetadata', d - 2 FROM b WHERE kind = 2 AND sub = 1 AND d >= 2
    UNION ALL
    SELECT 'locationPreview', d - 2 FROM b WHERE kind = 2 AND sub = 1 AND d >= 2
    UNION ALL
    SELECT 'locationPreview', d - 2
    FROM b WHERE kind = 2 AND sub = 1 AND d >= 2 AND d % 2 = 0
    UNION ALL
    SELECT 'characterizedCompound', d - 2
    FROM b WHERE kind = 2 AND sub = 1 AND d >= 2 AND (d % 2 = 1 OR d % 8 = 2)
    UNION ALL
    SELECT 'hasMetadata', d - 1 FROM b WHERE kind = 2 AND sub = 2 AND d >= 1
  )
)
SELECT relation,
       CASE WHEN tgt % 17 != 0 THEN 'pid' ELSE 'unresolved' END AS resolved_by,
       count(*) AS n_edges
FROM edges
GROUP BY relation, resolved_by
ORDER BY relation, resolved_by
"""

REPO_FDO_SQL = """
SELECT pid, key, name, value_json FROM (
  SELECT base64(encode(base)) AS pid, key, name,
         CASE value_json
              WHEN '<BASE>' THEN base
              WHEN '<NAME>' THEN repo_name
              ELSE value_json END AS value_json
  FROM (VALUES ('https://chemotion.example', 'Chemotion'),
               ('https://nmrxiv.example', 'NMRXiv')) AS r(base, repo_name)
  CROSS JOIN (VALUES
    ('21.T11148/076759916209e5d62bd5', 'Kernel Information Profile',
     '21.T11148/b9b76f887845e32d29f7'),
    ('21.T11148/1c699a5d1b4ad3ba4956', 'digitalObjectType',
     '21.T11148/010acb220a9c2c8c0ee6'),
    ('21.T11148/b8457812905b83046284', 'digitalObjectLocation', '<BASE>'),
    ('21.T11969/8710d753ad10f371189b', 'landingPageLocation', '<BASE>'),
    ('21.T11148/6ae999552a0d2dca14d6', 'name', '<NAME>'),
    ('21.T11969/b736c3898dd1f6603e2c', 'resourceType', 'Repository')
  ) AS e(key, name, value_json)
)
ORDER BY pid, key, value_json
"""


_DTR_RENAME = """
    CASE key
        WHEN '21.T11148/b8457812905b83046284' THEN 'digitalObjectLocation'
        WHEN '21.T11148/6ae999552a0d2dca14d6' THEN 'name'
        WHEN '21.T11148/d0773859091aeb451528' THEN 'hasMetadata'
        WHEN '21.T11148/4fe7cde52629b61e3b82' THEN 'isMetadataFor'
        WHEN '21.T11148/aafd5fb4c7222e2d950a' THEN 'dateCreated'
        WHEN '21.T11148/397d831aa3a9d18eb52c' THEN 'dateModified'
        WHEN '21.T11969/d15381199a44a16dc88d' THEN 'characterizedCompound'
        WHEN '21.T11148/1c699a5d1b4ad3ba4956' THEN 'digitalObjectType'
        WHEN '21.T11148/076759916209e5d62bd5' THEN 'kernelInformationProfile'
        WHEN '21.T11148/a753134738da82809fc1' THEN 'hadPrimarySource'
        WHEN '21.T11148/1a73af9e7ae00182733b' THEN 'contact'
        ELSE key END
"""

#: deterministic "now" injected into both the Ray flattener and this oracle
#: (the reference stamps datetime.now() when dateCreated is absent —
#: elasticsearch.py:116-124; a wall clock can't be hash-compared)
FLATTEN_NOW_ISO = "2026-01-01T00:00:00"

# dict-valued entries (compound values, '{'-prefixed) never surface under
# their own key: each non-null inner (k, v) becomes 'key.subkey'
# (elasticsearch.py:87-106); every pid gains a scalar 'timestamp' field.
FLATTEN_SQL = (
    "WITH entries AS (" + ENTRIES_SQL + ")\n"
    + f"""
, base AS (
    SELECT pid, {_DTR_RENAME} AS field, value_json
    FROM entries WHERE value_json NOT LIKE '{{%'
    UNION ALL
    SELECT pid, field, value_json FROM (
        SELECT d.pid,
               d.fieldbase || '.' ||
               (CASE u.k
                    WHEN '21.T11969/6c4d3deac9a49b65886a' THEN 'molecularWeight'
                    WHEN '21.T11969/f9cb9b53273ce0da7739' THEN 'pubchemUrl'
                    ELSE u.k END) AS field,
               CAST(json_extract(d.value_json, '$."' || u.k || '"')
                    AS VARCHAR) AS value_json
        FROM (SELECT pid, {_DTR_RENAME} AS fieldbase, value_json
              FROM entries WHERE value_json LIKE '{{%') d,
             unnest(json_keys(d.value_json)) AS u(k)
    ) WHERE value_json IS NOT NULL
)
SELECT pid, field, n_values, as_list FROM (
    SELECT pid, field,
           count(DISTINCT value_json)::BIGINT AS n_values,
           (field IN ('isMetadataFor', 'hasMetadata', 'contact')
            OR count(DISTINCT value_json) > 1) AS as_list
    FROM base
    GROUP BY pid, field
    UNION ALL
    SELECT DISTINCT pid, 'timestamp' AS field, 1::BIGINT AS n_values,
           FALSE AS as_list
    FROM entries
)
ORDER BY pid, field
"""
)

TYPE_FIXES_SQL = (
    "WITH entries AS (" + ENTRIES_SQL + ")\n"
    + """
SELECT pid, key,
       CASE key
           WHEN '21.T11969/8710d753ad10f371189b'
               THEN '{"landingPageLocation": "' || value_json || '"}'
           WHEN '21.T11148/f3f0cbaa39fa9966b279'
               THEN '{"identifier": "' || value_json || '"}'
           WHEN '21.T11969/7a19f6d5c8e63dd6bfcb'
               THEN '{"NMR_Method": "' || value_json || '"}'
           ELSE '{"locationPreview/Sample": "' || value_json || '"}'
       END AS value_json
FROM entries
WHERE key IN ('21.T11969/8710d753ad10f371189b', '21.T11148/f3f0cbaa39fa9966b279',
              '21.T11969/7a19f6d5c8e63dd6bfcb', '21.T11148/7fdada5846281ef5d461')
ORDER BY pid, key, value_json
"""
)
