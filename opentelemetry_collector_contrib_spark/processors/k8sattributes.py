"""k8sattributes processor: pod association + metadata enrichment.

Reference: processor/k8sattributesprocessor —
- ``pod_association`` rules (config.go:290-315): an ordered list; each
  rule has up to 4 SOURCES (``from: resource_attribute`` with a name,
  or ``from: connection`` = the peer IP). The FIRST rule whose sources
  ALL resolve supplies the pod identifier (processor.go extractPodID /
  internal/kube client identifiers); if the pod store has no entry for
  that identifier, NO other rule is tried.
- metadata merge (processor.go:120-160): pod attributes, container
  attributes, then namespace and node attributes are added ONLY where
  the resource does not already carry the key (existing attrs win —
  the opposite of groupbyattrs' override).
- ``passthrough`` mode (config.go:20-33): only stamps ``k8s.pod.ip``
  from the connection source, no lookups.

Columnar restatement: the kube informer cache IS a dimension table —
(identifier columns, metadata map) — small enough to broadcast by
construction (a cluster has orders of magnitude fewer pods than rows).
Association = one broadcast LEFT join per rule, each gated on "this
rule is the first fully-resolved one", metadata coalesced across
rules; ns/node dims are two more broadcast joins keyed off the
already-merged attrs. The fact side NEVER shuffles; at 100 TB this is
the same plan as the geoip/lookup enrich family.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at

K8S_IP_LABEL = "k8s.pod.ip"  # kube.K8sIPLabelName


@dataclass
class AssociationSource:
    from_: str  # "resource_attribute" | "connection"
    name: str | None = None  # attribute name when from_ == resource_attribute

    def __post_init__(self):
        if self.from_ not in ("resource_attribute", "connection"):
            raise ValueError("from_ must be resource_attribute or connection")
        if self.from_ == "resource_attribute" and not self.name:
            raise ValueError("resource_attribute source needs a name")


@dataclass
class AssociationRule:
    """One pod_association rule: sources AND together (all must be
    present), dim_keys name the pod-dim columns they join against,
    positionally matched to sources."""

    sources: list[AssociationSource]
    dim_keys: list[str]

    def __post_init__(self):
        if not self.sources or len(self.sources) > 4:
            raise ValueError("1-4 association sources per rule")  # kube.PodIdentifierMaxLength
        if len(self.dim_keys) != len(self.sources):
            raise ValueError("dim_keys must match sources")


@dataclass
class K8sAttributes:
    pods: DataFrame  # identifier columns + `metadata` map<string,string>
    associations: list[AssociationRule]
    namespaces: DataFrame | None = None  # (name, metadata map)
    nodes: DataFrame | None = None  # (name, metadata map)
    passthrough: bool = False
    attrs_col: str = "attributes"
    connection_col: str = "ip"  # the peer-IP column (connection source)
    meta_col: str = "metadata"
    namespace_attr: str = "k8s.namespace.name"
    node_attr: str = "k8s.node.name"

    def _source_expr(self, df: DataFrame, s: AssociationSource) -> Column:
        if s.from_ == "connection":
            return (
                F.col(self.connection_col)
                if self.connection_col in df.columns
                else F.lit(None).cast("string")
            )
        if s.name in df.columns:
            return F.col(s.name)
        return try_element_at(F.col(self.attrs_col), s.name)

    @staticmethod
    def _merge_missing(attrs: Column, meta: Column) -> Column:
        """Add meta entries ONLY where attrs lacks the key (existing
        attributes win, processor.go:143-147)."""
        kept = F.map_filter(
            meta,
            lambda k, _v: ~F.array_contains(F.map_keys(attrs), k),
        )
        return F.when(meta.isNull(), attrs).otherwise(F.map_concat(attrs, kept))

    def __call__(self, df: DataFrame) -> DataFrame:
        # a NULL attributes map would null the merge (map_keys(null) ->
        # null predicate -> map_concat(null,..) -> null) and skip the
        # ip stamp: treat it as empty, like envelope.field_set does
        attrs = F.coalesce(
            F.col(self.attrs_col),
            F.from_json(F.lit("{}"), "map<string,string>"),
        )
        # connection source stamps k8s.pod.ip when absent (processor.go:125-131)
        conn = (
            F.col(self.connection_col)
            if self.connection_col in df.columns
            else F.lit(None).cast("string")
        )
        has_conn_rule = any(
            s.from_ == "connection" for r in self.associations for s in r.sources
        )
        out = df
        if has_conn_rule:
            out = out.withColumn(
                self.attrs_col,
                F.when(
                    conn.isNotNull()
                    & ~F.array_contains(F.map_keys(attrs), K8S_IP_LABEL),
                    F.map_concat(
                        attrs, F.create_map(F.lit(K8S_IP_LABEL), conn)
                    ),
                ).otherwise(attrs),
            )
        if self.passthrough:
            return out

        # first fully-resolved rule wins; later rules are NOT fallbacks
        # for a failed store lookup (extractPodID semantics)
        resolved = []
        for r in self.associations:
            vals = [self._source_expr(out, s) for s in r.sources]
            ok = None
            for v in vals:
                p = v.isNotNull()
                ok = p if ok is None else (ok & p)
            resolved.append((vals, ok if ok is not None else F.lit(False)))
        chosen = F.lit(-1)
        for i in range(len(resolved) - 1, -1, -1):
            chosen = F.when(resolved[i][1], F.lit(i)).otherwise(chosen)
        out = out.withColumn("__k8s_rule__", chosen)

        metas = []
        for i, (r, (vals, _ok)) in enumerate(zip(self.associations, resolved)):
            dim = F.broadcast(
                self.pods.select(
                    *[F.col(k).alias(f"__dk{i}_{j}__") for j, k in enumerate(r.dim_keys)],
                    F.col(self.meta_col).alias(f"__meta{i}__"),
                )
            )
            cond = F.col("__k8s_rule__") == i
            for j, v in enumerate(vals):
                cond = cond & (v == F.col(f"__dk{i}_{j}__"))
            out = out.join(dim, on=cond, how="left").drop(
                *[f"__dk{i}_{j}__" for j in range(len(r.dim_keys))]
            )
            metas.append(F.col(f"__meta{i}__"))
        if metas:
            pod_meta = F.coalesce(*metas) if len(metas) > 1 else metas[0]
            out = out.withColumn(
                self.attrs_col, self._merge_missing(F.col(self.attrs_col), pod_meta)
            ).drop(*[f"__meta{i}__" for i in range(len(metas))], "__k8s_rule__")
        else:
            out = out.drop("__k8s_rule__")

        # namespace / node metadata off the (now merged) attributes
        for dim_df, key_attr, tag in (
            (self.namespaces, self.namespace_attr, "ns"),
            (self.nodes, self.node_attr, "node"),
        ):
            if dim_df is None:
                continue
            dim = F.broadcast(
                dim_df.select(
                    F.col("name").alias(f"__{tag}_name__"),
                    F.col(self.meta_col).alias(f"__{tag}_meta__"),
                )
            )
            out = out.join(
                dim,
                on=try_element_at(F.col(self.attrs_col), key_attr)
                == F.col(f"__{tag}_name__"),
                how="left",
            )
            out = out.withColumn(
                self.attrs_col,
                self._merge_missing(F.col(self.attrs_col), F.col(f"__{tag}_meta__")),
            ).drop(f"__{tag}_name__", f"__{tag}_meta__")
        return out
